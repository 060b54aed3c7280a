#!/usr/bin/env python3
"""Build the lexical encoder's bundled assets (round 5): the IDF table
and the PMI co-occurrence ExpansionTable, from the same zero-egress
corpora the dense encoder trains on (knowledge sentences + harvested
container English + the QA training passages).

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
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from modular_rag_system_tpu.models.corpus import (
        harvest_container_text,
        load_knowledge,
        load_train_qa,
    )
    from modular_rag_system_tpu.models.default_ckpt import ASSET_DIR
    from modular_rag_system_tpu.models.lexical import (
        ExpansionTable,
        IdfTable,
        LexicalHashEncoder,
    )

    t0 = time.time()
    know = load_knowledge()
    qa_q, qa_p = load_train_qa()
    harv = harvest_container_text(max_sentences=120_000, max_py_files=8_000)
    print(f"[lex-assets] corpora: {len(know)} knowledge / {len(qa_p)} QA "
          f"/ {len(harv)} harvested ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    # held-out split mirrors tools/build_default_encoder.py exactly
    order = list(range(len(qa_q)))
    random.Random(13).shuffle(order)
    qa_q = [qa_q[i] for i in order]
    qa_p = [qa_p[i] for i in order]
    ho_q, ho_p = qa_q[-96:], qa_p[-96:]
    tr_p = qa_p[:-96]

    idf = IdfTable.from_texts(harv + know + tr_p)
    # knowledge corpus repeated: its facts are the densest source of
    # general-English co-occurrence, and PMI needs the counts
    exp = ExpansionTable.from_texts(know * 4 + tr_p + harv)
    idf.save(str(Path(ASSET_DIR) / "idf.json"))
    exp.save(str(Path(ASSET_DIR) / "expansion.json"))

    lex = LexicalHashEncoder(dim=384, idf=idf, expansion=exp)
    D = lex.encode(ho_p)
    Q = lex.encode(ho_q)
    s = Q @ D.T
    top = np.argsort(-s, axis=1)[:, :10]
    recall = float(np.mean([i in top[i] for i in range(len(ho_q))]))

    print(json.dumps({
        "idf_terms": len(idf.idf),
        "expansion_entries": len(exp.table),
        "heldout_qa_recall@10/lexical": round(recall, 4),
        "asset_dir": str(ASSET_DIR),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
