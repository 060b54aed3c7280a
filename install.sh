#!/usr/bin/env bash
# Install script — parity with the reference install.sh (venv + editable
# install + smoke import), updated for the TPU-native stack.
set -euo pipefail

PYTHON="${PYTHON:-python3}"
VENV_DIR="${VENV_DIR:-.venv}"

echo "== modular_rag_system_tpu installer =="

if [ ! -d "$VENV_DIR" ]; then
    echo "creating virtualenv at $VENV_DIR"
    "$PYTHON" -m venv "$VENV_DIR"
fi
# shellcheck disable=SC1091
source "$VENV_DIR/bin/activate"

pip install --upgrade pip >/dev/null
# jax[tpu] on TPU hosts; fall back to CPU jax elsewhere
if [ "${TPU:-0}" = "1" ]; then
    pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
else
    pip install "jax[cpu]"
fi
pip install -e ".[dev]"

echo "== smoke import =="
python - <<'EOF'
import modular_rag_system_tpu as m
print("modular_rag_system_tpu", m.__version__, "OK")
EOF

echo "== smoke self-test =="
JAX_PLATFORMS="${JAX_PLATFORMS:-}" python -m modular_rag_system_tpu.launcher \
    --test --encoder fake --port 0 --storage /tmp/rag_tpu_install_test

echo "install complete. Try: rag-tpu --cli"
