"""Metrics surface (reference: tests/metrics/test_metrics.py — asserts
Prometheus counters advance after generation)."""
import pytest


def _counter_value(counter, labels):
    return counter.labels(**labels)._value.get()


def test_prometheus_counters_advance(tmp_path):
    pytest.importorskip("prometheus_client")
    from tests.models.test_families import build_checkpoint
    path, _ = build_checkpoint("gpt_neox", tmp_path)

    from vllm_legacy_tpu import LLM, SamplingParams
    llm = LLM(model=path, dtype="float32", max_model_len=128,
              num_tpu_blocks_override=64, disable_log_stats=False)
    engine = llm.llm_engine
    stat_logger = engine.stat_logger
    assert stat_logger is not None and stat_logger._prom is not None

    prompts = ["Hello, my name is", "The quick brown fox"]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       detokenize=False)
    llm.generate(prompts, sp, use_tqdm=False)

    labels = stat_logger.labels
    prom = stat_logger._prom
    gen = _counter_value(prom.counter_generation_tokens, labels)
    assert gen == len(prompts) * 6, gen
    prompt_toks = _counter_value(prom.counter_prompt_tokens, labels)
    assert prompt_toks > 0

    # histograms observed TTFT/TPOT... at least the gauges are set
    assert prom.gauge_scheduler_running.labels(**labels)._value.get() \
        >= 0


def test_stats_local_log_includes_spec(monkeypatch):
    import time

    import vllm_legacy_tpu.engine.metrics as m
    sl = m.StatLogger(labels=dict(model_name="m"))
    sl.last_local_log = time.monotonic() - 1e6  # force the local log
    lines = []
    monkeypatch.setattr(
        m.logger, "info",
        lambda msg, *args: lines.append(msg % args))
    sl.log(m.Stats(now=time.monotonic(), num_prompt_tokens=10,
                   num_generation_tokens=20, spec_proposed=100,
                   spec_accepted=73, spec_emitted=120))
    text = " ".join(lines)
    assert "acceptance rate" in text and "0.73" in text, text
