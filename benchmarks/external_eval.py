#!/usr/bin/env python3
"""External (non-synthetic) retrieval eval runner — VERDICT r3 item 3.

Scores encoders on the hand-written 96-pair Q->passage set
(``assets/eval/external_qa.json``; data path never touches
``models/synth.py``).  Reports the bundled default encoder against the
chance floor and the deterministic baselines, so regressions in the
bundled checkpoint show up as a drop in a number no generator can
inflate.

Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from modular_rag_system_tpu.models.external_eval import (
        bundled_encoder_external_recall,
        load_external_qa,
        recall_at_k_external,
    )
    from modular_rag_system_tpu.models.fake import FeatureHashEncoder

    k = 10
    queries, passages = load_external_qa()
    t0 = time.time()
    out = {
        "eval": "hand-written external Q->passage set (assets/eval/"
                "external_qa.json)",
        "pairs": len(queries),
        "k": k,
        "chance": round(k / len(passages), 4),
        "hash_baseline_recall": round(
            recall_at_k_external(FeatureHashEncoder(dim=384), k=k), 4),
    }
    try:
        out["bundled_encoder_recall"] = round(
            bundled_encoder_external_recall(k), 4)
    except Exception as exc:
        out["bundled_encoder_recall"] = None
        out["bundled_encoder_error"] = str(exc)[:200]
    out["elapsed_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
