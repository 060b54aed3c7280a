"""ContextAggregator, RAGQueryProcessor, enhancement subsystems."""

import time

import pytest

from modular_rag_system_tpu.engine import RAGEngine
from modular_rag_system_tpu.orchestration.aggregator import ContextAggregator
from modular_rag_system_tpu.orchestration.enhancements import (
    CrossAppContextBridge,
    LearningAdaptationSystem,
    PredictiveContextSwitcher,
)
from modular_rag_system_tpu.orchestration.processor import RAGQueryProcessor


@pytest.fixture()
def engine(fake_config):
    eng = RAGEngine(fake_config)
    eng.add_document("Python machine learning tutorial with examples", source="docs")
    eng.add_document("typed some notes about python classes", source="keystroke",
                     content_type="keystroke")
    eng.add_document("Meeting notes about project deadlines", source="notes")
    return eng


# ---------------------------------------------------------------- aggregator
def test_query_type_inference():
    infer = ContextAggregator.infer_query_type
    assert infer("what is the deadline?") == "question"
    assert infer("suggest a better approach") == "suggestion"
    assert infer("complete this paragraph") == "completion"
    assert infer("analyze my typing patterns") == "analysis"
    assert infer("random text") == "question"  # default


def test_aggregator_context_building():
    agg = ContextAggregator()
    agg.add_keystroke_context("hello from editor", {"application": "editor", "wpm": 60})
    agg.add_keystroke_context("more text", {"application": "editor", "wpm": 40})
    agg.add_ocr_context("screen text", {"application": "browser", "confidence": 0.9})
    ctx = agg.build_query_context("what was I writing?")
    assert ctx.query_type == "question"
    assert ctx.active_application == "editor"
    assert "hello from editor" in ctx.recent_keystrokes
    assert ctx.recent_ocr == ["screen text"]
    assert ctx.typing_speed_wpm == pytest.approx(50.0)


def test_typing_analysis():
    agg = ContextAggregator()
    for wpm in (50, 50, 50):
        agg.add_keystroke_context("x", {"wpm": wpm})
    a = agg.get_typing_analysis()
    assert a["avg_wpm"] == 50
    assert a["productivity"] == 1.0
    assert a["consistency"] == 1.0


def test_aggregator_recency_window():
    agg = ContextAggregator()
    agg.add_keystroke_context("old", {"timestamp": time.time() - 1000})
    agg.add_keystroke_context("new", {"timestamp": time.time()})
    recent = agg.recent("keystroke")
    assert [e["content"] for e in recent] == ["new"]


# ---------------------------------------------------------------- processor
def test_processor_happy_path(engine):
    proc = RAGQueryProcessor(engine)
    resp = proc.process_query("what do my notes say about python?")
    assert resp.query_type == "question"
    assert resp.insight.startswith("## Insight")
    assert resp.sources
    assert 0.0 < resp.confidence <= 1.0
    assert resp.follow_up_queries
    assert not resp.from_cache


def test_processor_cache(engine):
    proc = RAGQueryProcessor(engine)
    r1 = proc.process_query("what about python?")
    r2 = proc.process_query("what about python?")
    assert not r1.from_cache and r2.from_cache
    assert proc.stats["cache_hits"] == 1


def test_processor_completion_uses_keystroke_filter(engine):
    proc = RAGQueryProcessor(engine)
    ctx = engine  # noqa - build context via aggregator
    agg = ContextAggregator()
    qctx = agg.build_query_context("complete my python sentence")
    resp = proc.process_query("complete my python sentence", qctx)
    assert resp.query_type == "completion"
    # only keystroke-source docs can appear
    assert all(s["source"] == "keystroke" for s in resp.sources)


def test_processor_fallback_on_error(fake_config):
    class Broken:
        def query(self, *a, **k):
            raise RuntimeError("boom")

        def get_enhanced_context(self, *a, **k):
            raise RuntimeError("boom")

    proc = RAGQueryProcessor(Broken())
    resp = proc.process_query("anything")
    assert resp.metadata.get("fallback") is True
    assert resp.confidence == 0.1
    assert proc.stats["fallbacks"] == 1


def test_processor_llm_integration(engine):
    class FakeLLM:
        available = True
        model = "fake-llm"

        def generate(self, prompt):
            assert "Question:" in prompt
            return "The notes describe python learning."

    proc = RAGQueryProcessor(engine, llm_client=FakeLLM())
    resp = proc.process_query("what do my notes say?")
    assert resp.ai_analysis == "The notes describe python learning."
    assert "### Analysis" in resp.insight
    assert resp.confidence >= 0.4  # ai part counted


# ---------------------------------------------------------------- enhancements
def test_bridge_links_and_retrieval():
    b = CrossAppContextBridge()
    b.add_context("editor", "python retrieval engine code with index words")
    b.add_context("browser", "docs about retrieval engine index tuning")
    bridged = b.get_bridged_context("retrieval engine index")
    assert bridged
    assert bridged[0]["relevance"] > 0
    assert any("-" in k for k in b.links)  # cross-app link recorded


def test_predictor():
    p = PredictiveContextSwitcher()
    for _ in range(5):
        p.record_context_switch("editor", "browser")
    p.record_context_switch("editor", "terminal")
    preds = p.predict_next_context("editor")
    assert preds[0]["application"] == "browser"
    assert 0 < preds[0]["confidence"] <= 0.9


def test_learner_adjustments():
    l = LearningAdaptationSystem()
    l.record_feedback("python index question", "positive")
    l.record_feedback("python index question", "followed")
    adj = l.get_response_adjustments("python index stuff question")
    assert adj["confidence_modifier"] > 1.0
    neutral = l.get_response_adjustments("completely unrelated thing")
    assert neutral["confidence_modifier"] == 1.0


def test_learner_rejects_bad_type():
    l = LearningAdaptationSystem()
    with pytest.raises(ValueError):
        l.record_feedback("q", "amazing")
