#!/usr/bin/env python3
"""Basic usage: ingest files, query with file links, print stats.

Capability parity with the reference ``examples/basic_usage.py`` (init ->
start -> ``query_with_files`` -> stats), against this framework's API.
Note the reference example crashed at runtime (its effective facade class
lacked ``query_with_files``, SURVEY §2.6); here both API families exist.

Run:  python examples/basic_usage.py
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from modular_rag_system_tpu.config import RAGConfig
from modular_rag_system_tpu.facade import EnhancedRAGSystem


def main() -> None:
    print("modular_rag_system_tpu - basic usage example")
    print("=" * 50)

    storage = tempfile.mkdtemp(prefix="rag_example_")
    cfg = RAGConfig.load(overrides={
        "store.storage_path": storage,
        "serving.file_server_port": 0,          # ephemeral port
        "retrieval.similarity_threshold": 0.1,
    })
    rag = EnhancedRAGSystem(cfg)
    try:
        rag.start()
        print(f"system started; file server on :{rag.files.port}")

        # add a couple of files
        docs_dir = pathlib.Path(storage) / "docs"
        docs_dir.mkdir()
        (docs_dir / "project_notes.txt").write_text(
            "The project roadmap covers retrieval quality, TPU scaling and "
            "benchmark automation for the next quarter."
        )
        (docs_dir / "config_reference.json").write_text(
            '{"index": {"tier": "bf16"}, "embedding": {"dim": 384}}'
        )
        for f in sorted(docs_dir.iterdir()):
            rec = rag.add_file_from_path(str(f))
            print(f"  ingested {rec.original_name} -> {rec.access_link}")

        # query with file references
        response = rag.query_with_files("What does the project roadmap cover?")
        print("\nquery results:")
        print(f"  documents: {len(response['results'])}")
        print(f"  file references: {len(response['file_references'])}")
        print(f"  retrieval time: {response['retrieval_time']*1000:.1f} ms")
        for r in response["results"][:3]:
            print(f"  - ({r['similarity']:.2f}) {r['content'][:70]}")
        for ref in response["file_references"]:
            print(f"  link: {ref['original_name']} -> {ref['access_link']}")

        stats = rag.get_system_stats()
        print("\nsystem statistics:")
        print(f"  indexed chunks: {stats['engine']['index']['count']}")
        print(f"  index tier:     {stats['engine']['index']['tier']}")
        print(f"  encoder:        {stats['engine']['encoder']}")
        print(f"  files:          {stats['files']['count']}")
        print("\nexample completed successfully")
    finally:
        rag.shutdown()
        print("system stopped")


if __name__ == "__main__":
    main()
