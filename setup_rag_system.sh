#!/usr/bin/env bash
# Environment bootstrap — parity with the reference setup_rag_system.sh
# (env probing, storage dirs, default config, launcher scripts, module
# smoke test, Ollama probe, quickstart doc), re-targeted at the
# TPU-native stack: probes jax + the TPU backend instead of installing
# chromadb/faiss, and generates launchers for the jax launcher entry
# points.  Reference: setup_rag_system.sh:1-291.
set -euo pipefail
cd "$(dirname "$0")"

BLUE='\033[0;34m'; GREEN='\033[0;32m'; YELLOW='\033[1;33m'; RED='\033[0;31m'; NC='\033[0m'
info()    { echo -e "${BLUE}[INFO]${NC} $1"; }
ok()      { echo -e "${GREEN}[SUCCESS]${NC} $1"; }
warn()    { echo -e "${YELLOW}[WARNING]${NC} $1"; }
fail()    { echo -e "${RED}[ERROR]${NC} $1"; }

echo "Setting up modular_rag_system_tpu"
echo "================================="

# --- sanity: run from the repo root ---------------------------------
if [[ ! -d "modular_rag_system_tpu" ]]; then
    fail "must be run from the repository root (modular_rag_system_tpu/ not found)"
    exit 1
fi

# --- python + core deps ----------------------------------------------
PYTHON="${PYTHON:-python3}"
pyver=$("$PYTHON" -c 'import sys; print(f"{sys.version_info[0]}.{sys.version_info[1]}")' 2>/dev/null || echo none)
if [[ "$pyver" == none ]]; then
    fail "python3 not found (3.10+ required)"
    exit 1
fi
ok "Python $pyver found"

# Optional dependency install (this image ships everything baked in;
# pass --install to build a venv via install.sh on a fresh machine)
if [[ "${1:-}" == "--install" ]]; then
    info "running install.sh (venv + editable install)"
    bash install.sh
fi

info "probing the JAX stack..."
if "$PYTHON" - <<'EOF'
import jax
devs = jax.devices()
plat = devs[0].platform if devs else "none"
print(f"  jax {jax.__version__}, {len(devs)} device(s), platform={plat}")
EOF
then
    ok "jax available"
else
    fail "jax import failed — install with: pip install 'jax[tpu]' (TPU) or 'jax[cpu]'"
    exit 1
fi

for mod in flax optax orbax.checkpoint; do
    if "$PYTHON" -c "import $mod" 2>/dev/null; then
        ok "$mod available"
    else
        warn "$mod not available — training/checkpointing features disabled"
    fi
done

# --- optional integrations -------------------------------------------
info "probing optional integrations..."
"$PYTHON" -c "import tkinter" 2>/dev/null && ok "tkinter (GUI) available" \
    || warn "tkinter missing — GUI disabled, use --cli"
"$PYTHON" -c "import pynput" 2>/dev/null && ok "pynput (OS keystroke capture) available" \
    || warn "pynput missing — keystroke capture limited to feed_event()/module CLI"
"$PYTHON" -c "import pytesseract" 2>/dev/null && ok "pytesseract (OCR) available" \
    || warn "pytesseract missing — OCR ingest disabled"
command -v xdotool >/dev/null 2>&1 && ok "xdotool (window tracking) available" \
    || warn "xdotool missing — window tracking falls back to wmctrl/Unknown"

# --- storage layout ---------------------------------------------------
info "setting up storage directories..."
mkdir -p rag_storage/keystrokes rag_storage/ocr_data rag_storage/checkpoints uploads
ok "storage directories created"

# --- default configuration -------------------------------------------
if [[ -f rag_config.json ]]; then
    info "rag_config.json already exists — leaving it untouched"
else
    info "writing default configuration..."
    "$PYTHON" - <<'EOF'
from modular_rag_system_tpu.config import RAGConfig
RAGConfig.load(path="rag_config.json", write_default=True)
print("  rag_config.json written from the typed default tree")
EOF
    ok "default configuration created: rag_config.json"
fi

# --- launcher scripts --------------------------------------------------
info "creating launcher scripts..."
cat > launch_rag_gui.sh <<'EOF'
#!/usr/bin/env bash
cd "$(dirname "$0")"
exec python -m modular_rag_system_tpu.launcher --gui --config rag_config.json "$@"
EOF
cat > launch_rag_cli.sh <<'EOF'
#!/usr/bin/env bash
cd "$(dirname "$0")"
exec python -m modular_rag_system_tpu.launcher --cli --config rag_config.json "$@"
EOF
cat > launch_rag_daemon.sh <<'EOF'
#!/usr/bin/env bash
cd "$(dirname "$0")"
exec python -m modular_rag_system_tpu.launcher --daemon --config rag_config.json "$@"
EOF
chmod +x launch_rag_gui.sh launch_rag_cli.sh launch_rag_daemon.sh
ok "launchers created: launch_rag_{gui,cli,daemon}.sh"

# --- smoke test ---------------------------------------------------------
info "testing core modules..."
if "$PYTHON" - <<'EOF'
from modular_rag_system_tpu.engine import RAGEngine
from modular_rag_system_tpu.pipeline import EmbeddingPipeline
from modular_rag_system_tpu.facade import EnhancedRAGSystem
from modular_rag_system_tpu.launcher import main  # noqa: F401
print("  core modules imported successfully")
EOF
then
    ok "core modules test passed"
else
    fail "core module import failed — check the package install"
    exit 1
fi

# --- Ollama (optional LLM/embedding backend) ---------------------------
info "checking Ollama availability (optional)..."
if curl -s --max-time 2 http://localhost:11434/api/tags >/dev/null 2>&1; then
    ok "Ollama is running"
    if curl -s --max-time 2 http://localhost:11434/api/tags | grep -q "nomic-embed-text"; then
        ok "nomic-embed-text model available"
    else
        warn "nomic-embed-text not found — install with: ollama pull nomic-embed-text"
    fi
else
    warn "Ollama not reachable — the device encoder is used for embeddings (no action needed)"
fi

# --- quickstart ---------------------------------------------------------
cat > QUICKSTART.md <<'EOF'
# Quickstart

Generated by setup_rag_system.sh.

| Command | What it does |
|---|---|
| `./launch_rag_cli.sh` | interactive REPL (query, add, stats) |
| `./launch_rag_gui.sh` | tkinter GUI (query/history/analytics tabs) |
| `./launch_rag_daemon.sh` | background capture + serving daemon |
| `python -m modular_rag_system_tpu.launcher --test` | end-to-end self-test |
| `python examples/basic_usage.py` | minimal API walkthrough |

Configuration lives in `rag_config.json` (defaults written by setup);
every key maps to the typed tree in `modular_rag_system_tpu/config.py`.
On TPU hosts the index and encoder run on the chip automatically; on
CPU-only machines everything still works (slower, same results).
EOF
ok "QUICKSTART.md written"

echo
ok "setup complete — try: ./launch_rag_cli.sh"
