"""Engine metrics: periodic local logging + optional Prometheus.

Reference: ``vllm/engine/metrics.py`` (Metrics :25, Stats :170,
StatLogger :209). Prometheus counters are registered lazily when
``prometheus_client`` is importable (it is optional here), so the
offline engine has zero serving deps.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from vllm_legacy_tpu.logger import init_logger

logger = init_logger(__name__)

_LOCAL_LOGGING_INTERVAL_SEC = 5.0


@dataclass
class Stats:
    """Snapshot of one engine step (reference: metrics.py:170)."""
    now: float
    num_running: int = 0
    num_waiting: int = 0
    num_swapped: int = 0
    num_preempted: int = 0
    num_prompt_tokens: int = 0
    num_generation_tokens: int = 0
    gpu_cache_usage: float = 0.0
    cpu_cache_usage: float = 0.0
    time_to_first_tokens: List[float] = field(default_factory=list)
    time_per_output_tokens: List[float] = field(default_factory=list)
    time_e2e_requests: List[float] = field(default_factory=list)
    # cumulative spec-decode counters (reference: spec_decode/metrics.py
    # AsyncMetricsCollector; logged as acceptance rate + system
    # efficiency, metrics.py:316-375)
    spec_proposed: int = 0
    spec_accepted: int = 0
    spec_emitted: int = 0


class PrometheusMetrics:
    """Prometheus gauges/counters/histograms (reference: Metrics :25)."""

    def __init__(self, labelnames: List[str]) -> None:
        from prometheus_client import Counter, Gauge, Histogram
        ns = "vlt"
        self.gauge_scheduler_running = Gauge(
            f"{ns}:num_requests_running",
            "Number of requests currently running.", labelnames)
        self.gauge_scheduler_waiting = Gauge(
            f"{ns}:num_requests_waiting",
            "Number of requests waiting.", labelnames)
        self.gauge_scheduler_swapped = Gauge(
            f"{ns}:num_requests_swapped",
            "Number of requests swapped to CPU.", labelnames)
        self.gauge_gpu_cache_usage = Gauge(
            f"{ns}:tpu_cache_usage_perc", "TPU KV-cache usage.",
            labelnames)
        self.gauge_cpu_cache_usage = Gauge(
            f"{ns}:cpu_cache_usage_perc", "CPU KV-cache usage.",
            labelnames)
        self.counter_prompt_tokens = Counter(
            f"{ns}:prompt_tokens_total", "Prefill tokens processed.",
            labelnames)
        self.counter_generation_tokens = Counter(
            f"{ns}:generation_tokens_total", "Generation tokens.",
            labelnames)
        self.counter_preemptions = Counter(
            f"{ns}:num_preemptions_total", "Preemptions.", labelnames)
        self.histogram_time_to_first_token = Histogram(
            f"{ns}:time_to_first_token_seconds", "TTFT histogram.",
            labelnames,
            buckets=[0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1,
                     0.25, 0.5, 0.75, 1.0, 2.5, 5.0, 7.5, 10.0])
        self.histogram_time_per_output_token = Histogram(
            f"{ns}:time_per_output_token_seconds", "TPOT histogram.",
            labelnames,
            buckets=[0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3,
                     0.4, 0.5, 0.75, 1.0, 2.5])
        self.histogram_e2e_request_latency = Histogram(
            f"{ns}:e2e_request_latency_seconds", "E2E latency.",
            labelnames,
            buckets=[1.0, 2.5, 5.0, 10.0, 15.0, 20.0, 30.0, 40.0, 50.0,
                     60.0])


_PROM_CACHE: Dict[tuple, "PrometheusMetrics"] = {}


class StatLogger:
    """Aggregates per-step stats; logs locally every 5s and exports to
    Prometheus when available (reference: StatLogger :209)."""

    def __init__(self, labels: Dict[str, str]) -> None:
        self.labels = labels
        self.last_local_log = time.time()
        self.num_prompt_tokens: List[int] = []
        self.num_generation_tokens: List[int] = []
        self._prom: Optional[PrometheusMetrics] = None
        # prometheus collectors are registry-global: share one
        # PrometheusMetrics per label schema so a second engine in the
        # same process (tests, multi-model servers) doesn't collide
        key = tuple(sorted(labels.keys()))
        try:
            if key not in _PROM_CACHE:
                _PROM_CACHE[key] = PrometheusMetrics(list(labels.keys()))
            self._prom = _PROM_CACHE[key]
        except Exception:
            self._prom = None

    def _label_values(self):
        return list(self.labels.values())

    def log(self, stats: Stats) -> None:
        self.num_prompt_tokens.append(stats.num_prompt_tokens)
        self.num_generation_tokens.append(stats.num_generation_tokens)

        if self._prom is not None:
            lv = self.labels
            self._prom.gauge_scheduler_running.labels(**lv).set(
                stats.num_running)
            self._prom.gauge_scheduler_waiting.labels(**lv).set(
                stats.num_waiting)
            self._prom.gauge_scheduler_swapped.labels(**lv).set(
                stats.num_swapped)
            self._prom.gauge_gpu_cache_usage.labels(**lv).set(
                stats.gpu_cache_usage)
            self._prom.gauge_cpu_cache_usage.labels(**lv).set(
                stats.cpu_cache_usage)
            self._prom.counter_prompt_tokens.labels(**lv).inc(
                stats.num_prompt_tokens)
            self._prom.counter_generation_tokens.labels(**lv).inc(
                stats.num_generation_tokens)
            if stats.num_preempted:
                self._prom.counter_preemptions.labels(**lv).inc(
                    stats.num_preempted)
            for t in stats.time_to_first_tokens:
                self._prom.histogram_time_to_first_token.labels(
                    **lv).observe(t)
            for t in stats.time_per_output_tokens:
                self._prom.histogram_time_per_output_token.labels(
                    **lv).observe(t)
            for t in stats.time_e2e_requests:
                self._prom.histogram_e2e_request_latency.labels(
                    **lv).observe(t)

        now = stats.now
        if now - self.last_local_log > _LOCAL_LOGGING_INTERVAL_SEC:
            elapsed = now - self.last_local_log
            prompt_tput = sum(self.num_prompt_tokens) / elapsed
            gen_tput = sum(self.num_generation_tokens) / elapsed
            spec_msg = ""
            if stats.spec_proposed:
                # draft acceptance + system efficiency (reference
                # StatLogger spec summary, metrics.py:358-375)
                acc = stats.spec_accepted / max(stats.spec_proposed, 1)
                spec_msg = (f", Spec acceptance rate: {acc:.2f} "
                            f"({stats.spec_accepted}/"
                            f"{stats.spec_proposed} draft tokens)")
            logger.info(
                "Avg prompt throughput: %.1f tokens/s, "
                "Avg generation throughput: %.1f tokens/s, "
                "Running: %d reqs, Swapped: %d reqs, Pending: %d reqs, "
                "TPU KV cache usage: %.1f%%%s",
                prompt_tput, gen_tput, stats.num_running,
                stats.num_swapped, stats.num_waiting,
                stats.gpu_cache_usage * 100, spec_msg)
            self.num_prompt_tokens = []
            self.num_generation_tokens = []
            self.last_local_log = now

    def log_step(self, scheduler_outputs, now: float,
                 spec_metrics=None,
                 num_generation_tokens=None) -> None:
        """Cheap per-step hook used by LLMEngine.

        ``num_generation_tokens`` is the exact emitted count when the
        engine knows it (multi-step / spec decode emit a variable
        number per step); otherwise fall back to schedule-time chunks.
        """
        # log_step runs AFTER output processing, so is_prefill() has
        # already flipped — use the schedule-time prefill-group count
        # (prefill groups are ordered first in scheduled_seq_groups)
        num_prompt = 0
        num_gen = 0
        npf = scheduler_outputs.num_prefill_groups
        for i, sched in enumerate(
                scheduler_outputs.scheduled_seq_groups):
            if i < npf:
                num_prompt += sched.token_chunk_size
            else:
                num_gen += sched.token_chunk_size
        if num_generation_tokens is not None:
            # exact emitted tokens == the user-visible completion
            # tokens (a prefill step emits each sequence's first one)
            num_gen = num_generation_tokens
        sm = spec_metrics or {}
        self.log(Stats(now=now,
                       num_prompt_tokens=num_prompt,
                       num_generation_tokens=num_gen,
                       num_preempted=scheduler_outputs.preempted,
                       num_running=scheduler_outputs.running_queue_size,
                       spec_proposed=sm.get("spec_proposed", 0),
                       spec_accepted=sm.get("spec_accepted", 0),
                       spec_emitted=sm.get("spec_emitted", 0)))
