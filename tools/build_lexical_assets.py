#!/usr/bin/env python3
"""Build the lexical encoder's bundled assets (round 5): the IDF table
and the PMI co-occurrence ExpansionTable, via the canonical recipe in
``models.lexical.build_lexical_statistics`` (shared with
tools/build_default_encoder.py so the assets can never drift).

No TPU required — pure host work, a couple of minutes.  Run after any
change to the stemmer, lexicon, or corpora so the bundled statistics
stay consistent with the feature definition (models/lexical.py).

Prints one JSON line with table sizes and the held-out QA recall of
the refreshed lexical encoder (the tuning signal — the external eval
is never consulted).
"""

from __future__ import annotations

import json
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from modular_rag_system_tpu.models.corpus import load_train_qa
    from modular_rag_system_tpu.models.lexical import (
        ExpansionTable,
        IdfTable,
        LexicalHashEncoder,
        build_lexical_statistics,
    )

    stats = build_lexical_statistics()
    print(f"[lex-assets] {stats}", file=sys.stderr)

    # held-out split mirrors tools/build_default_encoder.py exactly
    qa_q, qa_p = load_train_qa()
    order = list(range(len(qa_q)))
    random.Random(13).shuffle(order)
    ho_q = [qa_q[i] for i in order][-96:]
    ho_p = [qa_p[i] for i in order][-96:]

    d = Path(stats["asset_dir"])
    lex = LexicalHashEncoder(
        dim=384,
        idf=IdfTable.load(str(d / "idf.json")),
        expansion=ExpansionTable.load(str(d / "expansion.json")),
    )
    D = lex.encode(ho_p)
    Q = lex.encode(ho_q)
    s = Q @ D.T
    top = np.argsort(-s, axis=1)[:, :10]
    recall = float(np.mean([i in top[i] for i in range(len(ho_q))]))

    print(json.dumps({
        **{k: v for k, v in stats.items() if k != "corpora"},
        "heldout_qa_recall@10/lexical": round(recall, 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
