"""Synchronous engine: tokenize → schedule → execute → process outputs.

Reference: ``vllm/engine/llm_engine.py`` LLMEngine :61 (add_request :498,
step :741, _process_model_outputs :667, _initialize_kv_caches :307).
TPU redesign: one executor (single-controller SPMD mesh), deterministic
KV sizing, no Ray/mp selection logic (llm_engine.py:329-366).
"""
from __future__ import annotations

import time
from typing import Any, Dict, Iterable, List, Optional, Type, Union

from vllm_legacy_tpu.config import EngineConfig
from vllm_legacy_tpu.core.scheduler import Scheduler, SchedulerOutputs
from vllm_legacy_tpu.engine.output_processor.single_step import (
    SingleStepOutputProcessor)
from vllm_legacy_tpu.engine.output_processor.stop_checker import StopChecker
from vllm_legacy_tpu.executor.executor_base import ExecutorBase
from vllm_legacy_tpu.inputs import LLMInputs, PromptInputs
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.outputs import RequestOutput, RequestOutputFactory
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.sequence import (ExecuteModelRequest, SamplerOutput,
                                      Sequence, SequenceGroup,
                                      SequenceStatus)
from vllm_legacy_tpu.transformers_utils.detokenizer import Detokenizer
from vllm_legacy_tpu.transformers_utils.tokenizer import TokenizerGroup
from vllm_legacy_tpu.utils import Counter

logger = init_logger(__name__)


class LLMEngine:

    def __init__(
        self,
        engine_config: EngineConfig,
        executor_class: Optional[Type[ExecutorBase]] = None,
        log_stats: bool = True,
    ) -> None:
        self.engine_config = engine_config
        self.model_config = engine_config.model_config
        self.cache_config = engine_config.cache_config
        self.parallel_config = engine_config.parallel_config
        self.scheduler_config = engine_config.scheduler_config
        self.lora_config = engine_config.lora_config
        self.log_stats = log_stats

        self.seq_counter = Counter()

        if not self.model_config.skip_tokenizer_init:
            self.tokenizer: Optional[TokenizerGroup] = TokenizerGroup(
                self.model_config.tokenizer,
                tokenizer_mode=self.model_config.tokenizer_mode,
                trust_remote_code=self.model_config.trust_remote_code,
                revision=self.model_config.revision,
                enable_lora=bool(self.lora_config),
                tokenizer_pool_size=getattr(self.model_config,
                                            "tokenizer_pool_size", 0),
            )
            self.detokenizer: Optional[Detokenizer] = Detokenizer(
                self.tokenizer)
        else:
            self.tokenizer = None
            self.detokenizer = None

        if executor_class is None:
            from vllm_legacy_tpu.executor.tpu_executor import TPUExecutor
            executor_class = TPUExecutor
        self.model_executor = executor_class(engine_config)

        self._initialize_kv_caches()

        self.scheduler = Scheduler(self.scheduler_config, self.cache_config,
                                   self.lora_config)

        self.output_processor = SingleStepOutputProcessor(
            self.scheduler_config,
            self.detokenizer,
            self.scheduler,
            self.seq_counter,
            StopChecker(self.model_config.max_model_len,
                        self._get_tokenizer_for_seq),
        )

        from vllm_legacy_tpu.engine.metrics import StatLogger
        self.stat_logger = StatLogger(
            labels=dict(model_name=self.model_config.served_model_name)
        ) if log_stats else None

        # opt-out anonymous usage record (reference: llm_engine.py
        # usage_message.report_usage; local-file variant, usage/)
        from vllm_legacy_tpu.usage import UsageContext, usage_message
        archs = getattr(self.model_config.hf_config, "architectures",
                        None) or ["unknown"]
        usage_message.report_usage(
            archs[0], UsageContext.ENGINE_CONTEXT,
            extra_kvs=dict(
                dtype=str(self.model_config.dtype),
                tensor_parallel_size=self.parallel_config.
                tensor_parallel_size,
                block_size=self.cache_config.block_size,
                quantization=self.model_config.quantization))

    # ------------------------------------------------------------------
    @classmethod
    def from_engine_args(cls, engine_args,
                         log_stats: Optional[bool] = None) -> "LLMEngine":
        engine_config = engine_args.create_engine_config()
        engine = cls(engine_config,
                     log_stats=not engine_args.disable_log_stats
                     if log_stats is None else log_stats)
        if getattr(engine_args, "prewarm_decode", False):
            engine.prewarm_decode_buckets()
        return engine

    def prewarm_decode_buckets(self, buckets=None) -> float:
        """Compile the (decode batch-bucket, multi-step k) grid up
        front — the TPU analogue of the reference's CUDA-graph capture
        at init (reference worker/model_runner.py capture_model: one
        graph per batch size, vllm/worker/model_runner.py:976-1018).

        Serving traffic churns batch buckets, and with
        num_scheduler_steps > 1 each (bucket, k) pair otherwise
        compiles on FIRST USE mid-traffic (measured: p99 TPOT 14 s
        under churn) — which is why multi-step serving was previously
        unsupported. This drives the engine's own request path with
        throwaway single-token requests: for each bucket, bucket
        seats decode under queue pressure with a max_tokens budget
        sized so the burst horizon walks the whole compiled
        {4, 8, ..., k} ladder. Engine state drains completely; only
        wall-clock (returned, seconds) and the XLA compile cache are
        affected.
        """
        import time as _time

        from vllm_legacy_tpu.worker.model_runner import (
            _MAX_NUM_SEQS_BUCKETS)

        assert not self.has_unfinished_requests(), \
            "prewarm_decode_buckets needs an idle engine"
        k = self.scheduler_config.num_scheduler_steps
        seats = self.scheduler_config.max_num_seqs
        if buckets is None:
            buckets = [b for b in _MAX_NUM_SEQS_BUCKETS if b <= seats]
            if not buckets:
                buckets = [seats]
        # sum of the {k, k/2, ..., 8, 4} ladder + 1: each burst's
        # remaining-token horizon lands exactly on the next rung
        ladder_tokens = max(2 * k - 3, 3)
        ladder_tokens = min(ladder_tokens,
                            self.model_config.max_model_len - 2)
        # a realistic prompt length so the PREFILL bucket serving
        # traffic actually hits is compiled too (1-token prompts only
        # warmed the smallest prefill shape; the first live sweep then
        # paid multi-second prefill compiles inside TTFT)
        prompt_len = max(1, min(128, self.model_config.max_model_len -
                                ladder_tokens - 2))
        t0 = _time.monotonic()
        saved_seats = self.scheduler_config.max_num_seqs
        try:
            for b in buckets:
                # cap seats at the bucket so b requests decode while
                # one waits (queue pressure shortens the bursts down
                # the ladder); restore afterwards
                self.scheduler_config.max_num_seqs = min(b, saved_seats)
                for i in range(min(b, saved_seats) + 1):
                    self.add_request(
                        f"_prewarm-{b}-{i}",
                        {"prompt_token_ids": [1] * prompt_len},
                        SamplingParams(temperature=0.0,
                                       max_tokens=ladder_tokens,
                                       ignore_eos=True,
                                       detokenize=False))
                while self.has_unfinished_requests():
                    self.step()
        finally:
            self.scheduler_config.max_num_seqs = saved_seats
        dt = _time.monotonic() - t0
        logger.info(
            "Prewarmed decode buckets %s (k=%d) in %.1fs",
            list(buckets), k, dt)
        return dt

    def _initialize_kv_caches(self) -> None:
        num_tpu_blocks, num_cpu_blocks = (
            self.model_executor.determine_num_available_blocks())
        self.cache_config.num_tpu_blocks = num_tpu_blocks
        self.cache_config.num_cpu_blocks = num_cpu_blocks
        self.model_executor.initialize_cache(num_tpu_blocks,
                                             num_cpu_blocks)

    def _get_tokenizer_for_seq(self, sequence: Sequence):
        if self.tokenizer is None:
            return None
        return self.tokenizer.get_lora_tokenizer(None)

    def get_tokenizer(self):
        if self.tokenizer is None:
            return None
        return self.tokenizer.get_lora_tokenizer(None)

    # ------------------------------------------------------------------
    # Request intake
    # ------------------------------------------------------------------
    def _get_eos_token_id(self, lora_request=None) -> Optional[int]:
        if self.tokenizer is None:
            return None
        return self.tokenizer.get_lora_tokenizer(
            lora_request).eos_token_id

    def process_model_inputs(self, request_id: str,
                             inputs: PromptInputs,
                             lora_request=None) -> LLMInputs:
        if isinstance(inputs, str):
            inputs = {"prompt": inputs}
        if "prompt_token_ids" not in inputs:
            prompt_token_ids = self.tokenizer.encode(
                inputs["prompt"], request_id=request_id,
                lora_request=lora_request)
        else:
            prompt_token_ids = inputs["prompt_token_ids"]
        return LLMInputs(prompt_token_ids=prompt_token_ids,
                         prompt=inputs.get("prompt"),
                         multi_modal_data=inputs.get("multi_modal_data"))

    def _check_v_offload_request(self, params) -> None:
        if not self.cache_config.v_offload_window:
            return
        if params is not None and getattr(params, "best_of", 1) and \
                (params.best_of > 1
                 or getattr(params, "use_beam_search", False)):
            raise ValueError(
                "best_of > 1 / beam search need copy-on-write KV "
                "blocks, which the V-offload ring does not support")

    def add_request(
        self,
        request_id: str,
        inputs: PromptInputs,
        params,  # SamplingParams | PoolingParams
        arrival_time: Optional[float] = None,
        lora_request=None,
    ) -> None:
        if arrival_time is None:
            arrival_time = time.time()
        self._check_v_offload_request(params)
        processed = self.process_model_inputs(request_id, inputs,
                                              lora_request)
        self._enqueue_processed_request(request_id, processed, params,
                                        arrival_time, lora_request)

    def _enqueue_processed_request(self, request_id: str,
                                   processed: LLMInputs, params,
                                   arrival_time: float,
                                   lora_request) -> None:
        """Tokenized-input tail of add_request; shared with the async
        engine (which tokenizes in the event loop)."""
        if len(processed["prompt_token_ids"]) > \
                self.model_config.max_model_len:
            raise ValueError(
                f"Prompt length {len(processed['prompt_token_ids'])} "
                f"exceeds max_model_len {self.model_config.max_model_len}")

        block_size = self.cache_config.block_size
        seq_id = next(self.seq_counter)
        eos_token_id = self._get_eos_token_id(lora_request)
        seq = Sequence(seq_id, processed.get("prompt"),
                       processed["prompt_token_ids"], block_size,
                       eos_token_id, lora_request)

        from vllm_legacy_tpu.pooling_params import PoolingParams
        if isinstance(params, PoolingParams):
            seq_group = SequenceGroup(
                request_id=request_id, seqs=[seq],
                arrival_time=arrival_time, pooling_params=params,
                lora_request=lora_request,
                multi_modal_data=processed.get("multi_modal_data"))
        else:
            params = params.clone()
            if params.max_tokens is None:
                params.max_tokens = max(
                    self.model_config.max_model_len -
                    seq.get_prompt_len(), 1)
            seq_group = SequenceGroup(
                request_id=request_id, seqs=[seq],
                arrival_time=arrival_time, sampling_params=params,
                lora_request=lora_request,
                multi_modal_data=processed.get("multi_modal_data"))
        self.scheduler.add_seq_group(seq_group)

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        self.scheduler.abort_seq_group(request_id)

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------
    def get_model_config(self):
        return self.model_config

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_seq_groups()

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_seqs()

    def check_health(self) -> None:
        self.model_executor.check_health()

    # ------------------------------------------------------------------
    # The hot loop
    # ------------------------------------------------------------------
    def step(self) -> List[RequestOutput]:
        """One engine iteration (reference: llm_engine.py:741)."""
        seq_group_metadata_list, scheduler_outputs = \
            self.scheduler.schedule()

        request = self._wire_execute_request(seq_group_metadata_list,
                                             scheduler_outputs)
        outputs = (self.model_executor.execute_model(request)
                   if request is not None else [])
        return self._process_model_outputs(outputs, scheduler_outputs)

    @staticmethod
    def _wire_execute_request(seq_group_metadata_list,
                              scheduler_outputs
                              ) -> Optional[ExecuteModelRequest]:
        """Freeze one step's schedule into the executor wire format;
        None when there is nothing to run. Shared with step_async."""
        if scheduler_outputs.is_empty():
            return None
        return ExecuteModelRequest(
            seq_group_metadata_list=seq_group_metadata_list,
            blocks_to_swap_in=scheduler_outputs.blocks_to_swap_in,
            blocks_to_swap_out=scheduler_outputs.blocks_to_swap_out,
            blocks_to_copy=scheduler_outputs.blocks_to_copy,
            num_lookahead_slots=scheduler_outputs.num_lookahead_slots,
            running_queue_size=scheduler_outputs.running_queue_size,
            waiting_queue_size=getattr(scheduler_outputs,
                                       "waiting_queue_size", 0),
            steps_to_first_free=getattr(scheduler_outputs,
                                        "steps_to_first_free", 0),
        )

    def _process_model_outputs(
            self, outputs: List[SamplerOutput],
            scheduler_outputs: SchedulerOutputs) -> List[RequestOutput]:
        now = time.time()
        request_outputs: List[RequestOutput] = []

        from vllm_legacy_tpu.sequence import PoolerOutput
        if outputs and isinstance(outputs[0], PoolerOutput):
            # Embedding models: one prefill step produces the pooled
            # vector; the group finishes immediately (reference:
            # llm_engine.py _process_sequence_group_outputs for
            # embeddings).
            for scheduled, group_output in zip(
                    scheduler_outputs.scheduled_seq_groups,
                    outputs[0].outputs):
                seq_group = scheduled.seq_group
                seq_group.update_num_computed_tokens(
                    scheduled.token_chunk_size)
                seq_group.embeddings = group_output.embeddings
                for seq in seq_group.get_seqs():
                    seq.status = SequenceStatus.FINISHED_STOPPED
            self.scheduler.free_finished_seq_groups()
            for scheduled in scheduler_outputs.scheduled_seq_groups:
                scheduled.seq_group.maybe_set_first_token_time(now)
                request_outputs.append(
                    RequestOutputFactory.create(scheduled.seq_group))
            for seq_group in scheduler_outputs.ignored_seq_groups:
                request_outputs.append(
                    RequestOutputFactory.create(seq_group))
            return request_outputs

        if outputs:
            # Multi-step decode returns one SamplerOutput per on-device
            # step; apply them in order with stop checks between steps
            # (reference: MultiStepOutputProcessor, engine/
            # output_processor/multi_step.py:20).
            for k, sampler_output in enumerate(outputs):
                for scheduled, group_output in zip(
                        scheduler_outputs.scheduled_seq_groups,
                        sampler_output.outputs):
                    seq_group = scheduled.seq_group
                    if k == 0:
                        seq_group.update_num_computed_tokens(
                            scheduled.token_chunk_size)
                        self.output_processor.process_prompt_logprob(
                            seq_group, [group_output])
                    elif (not seq_group.is_finished()
                          and group_output.samples):
                        # later sub-steps each computed one more token
                        # (speculative outputs are ragged per sequence)
                        seq_group.update_num_computed_tokens(1)
                    if seq_group.is_finished():
                        continue
                    if seq_group.is_prefill() and not group_output.samples:
                        # chunked prefill: nothing sampled yet
                        continue
                    self.output_processor.process_outputs(
                        seq_group, [group_output])

        self.scheduler.free_finished_seq_groups()

        for scheduled in scheduler_outputs.scheduled_seq_groups:
            seq_group = scheduled.seq_group
            seq_group.maybe_set_first_token_time(now)
            request_output = RequestOutputFactory.create(seq_group)
            request_outputs.append(request_output)
        for seq_group in scheduler_outputs.ignored_seq_groups:
            request_outputs.append(RequestOutputFactory.create(seq_group))

        if self.stat_logger is not None:
            runner = getattr(
                getattr(self.model_executor, "worker", None),
                "model_runner", None)
            # exact generated-token count: multi-step / spec decode
            # emit a variable number of tokens per engine step, so the
            # schedule-time chunk sizes under-/over-count
            num_gen = sum(
                len(group_output.samples)
                for sampler_output in (outputs or [])
                for group_output in sampler_output.outputs)
            self.stat_logger.log_step(
                scheduler_outputs, now,
                spec_metrics=getattr(runner, "runner_metrics", None),
                num_generation_tokens=num_gen or None)
        return request_outputs
