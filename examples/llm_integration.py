#!/usr/bin/env python3
"""LLM integration: build a generation prompt from retrieval results.

Capability parity with the reference ``examples/llm_integration.py``
(file references + top snippets assembled into an LLM context prompt).
When an Ollama server is reachable the prompt is actually sent; otherwise
the assembled prompt is printed (graceful degradation, SURVEY §5).

Run:  python examples/llm_integration.py
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from modular_rag_system_tpu.config import RAGConfig
from modular_rag_system_tpu.facade import EnhancedRAGSystem


def build_llm_context(rag: EnhancedRAGSystem, user_query: str) -> str:
    response = rag.query_with_files(user_query)
    lines = [f"User Query: {user_query}", "", "Available Documents:"]
    for ref in response["file_references"]:
        lines.append(
            f"- {ref['original_name']} ({ref['content_type']}) -> {ref['access_link']}"
        )
    if response["results"]:
        lines.append("")
        lines.append("Relevant Content Snippets:")
        for i, r in enumerate(response["results"][:3], 1):
            lines.append(f"{i}. ({r['similarity']:.2f}) {r['content'][:200]}")
    lines.append("")
    lines.append("Answer the user using only the context above.")
    return "\n".join(lines)


def main() -> None:
    print("LLM integration example")
    print("=" * 40)
    storage = tempfile.mkdtemp(prefix="rag_llm_example_")
    cfg = RAGConfig.load(overrides={
        "store.storage_path": storage,
        "serving.file_server_port": 0,
        "retrieval.similarity_threshold": 0.1,
    })
    rag = EnhancedRAGSystem(cfg)
    try:
        rag.start()
        seed = pathlib.Path(storage) / "kb.txt"
        seed.write_text(
            "System documentation: the retrieval engine runs on TPU with a "
            "fused top-k kernel. Configuration data lives in rag_config.json."
        )
        rag.add_file_from_path(str(seed))

        for query in (
            "What system documentation is available?",
            "Where does configuration data live?",
        ):
            print(f"\nquery: {query}")
            print("-" * 50)
            prompt = build_llm_context(rag, query)
            if rag.llm is not None and getattr(rag.llm, "available", False):
                print("LLM answer:", rag.llm.generate(prompt))
            else:
                print("(no LLM reachable - assembled prompt below)")
                print(prompt)
    finally:
        rag.shutdown()


if __name__ == "__main__":
    main()
