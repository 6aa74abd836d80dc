"""Async engine: per-request streams over the synchronous engine loop.

Reference: ``vllm/engine/async_llm_engine.py`` (AsyncStream :52,
RequestTracker :85, background run_engine_loop :513, step_async :204,
engine-dead propagation :29-50). The Ray-remote engine option
(engine_use_ray) has no TPU analogue — the single-controller engine
lives in-process and the jitted step releases the GIL while the chips
run, so an executor-thread offload gives the event loop its air.
"""
from __future__ import annotations

import asyncio
import time
from functools import partial
from typing import (AsyncIterator, Callable, Dict, Iterable, List,
                    Optional, Set, Tuple, Type, Union)

from vllm_legacy_tpu.config import EngineConfig
from vllm_legacy_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_legacy_tpu.engine.llm_engine import LLMEngine
from vllm_legacy_tpu.inputs import LLMInputs, PromptInputs
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.outputs import EmbeddingRequestOutput, RequestOutput
from vllm_legacy_tpu.pooling_params import PoolingParams
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu import envs

logger = init_logger(__name__)

ENGINE_ITERATION_TIMEOUT_S = envs.VLT_ENGINE_ITERATION_TIMEOUT_S


class AsyncEngineDeadError(RuntimeError):
    pass


def _log_task_completion(task: asyncio.Task,
                         error_callback: Callable[[Exception],
                                                  None]) -> None:
    exception = None
    try:
        return_value = task.result()
        raise AssertionError(
            f"The engine background task should never finish without an "
            f"exception. {return_value}")
    except asyncio.exceptions.CancelledError:
        return
    except KeyboardInterrupt:
        raise
    except Exception as e:
        exception = e
        logger.error("Engine background task failed", exc_info=e)
        error_callback(exception)
        raise AsyncEngineDeadError(
            "Task finished unexpectedly. This should never happen! "
            "See stack trace above for the actual cause.") from e


class AsyncStream:
    """Per-request stream of RequestOutputs (reference: :52)."""

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._queue: asyncio.Queue = asyncio.Queue()
        self._finished = False

    def put(self, item: Union[RequestOutput, EmbeddingRequestOutput,
                              Exception]) -> None:
        if self._finished:
            return
        self._queue.put_nowait(item)

    def finish(self) -> None:
        self._queue.put_nowait(StopAsyncIteration())
        self._finished = True

    @property
    def finished(self) -> bool:
        return self._finished

    def __aiter__(self):
        return self

    async def __anext__(self) -> Union[RequestOutput,
                                       EmbeddingRequestOutput]:
        result = await self._queue.get()
        if isinstance(result, StopAsyncIteration):
            raise StopAsyncIteration
        elif isinstance(result, Exception):
            raise result
        return result


class RequestTracker:
    """New/aborted request books shared between API handlers and the
    engine loop (reference: :85)."""

    def __init__(self) -> None:
        self._request_streams: Dict[str, AsyncStream] = {}
        self._finished_requests: asyncio.Queue[str] = asyncio.Queue()
        self._new_requests: asyncio.Queue[Tuple[AsyncStream,
                                                dict]] = asyncio.Queue()
        self.new_requests_event = asyncio.Event()

    def __contains__(self, item) -> bool:
        return item in self._request_streams

    def __len__(self) -> int:
        return len(self._request_streams)

    def propagate_exception(self, exc: Exception,
                            request_id: Optional[str] = None) -> None:
        if request_id is not None:
            self.abort_request(request_id)
            if request_id in self._request_streams:
                self._request_streams[request_id].put(exc)
        else:
            for rid, stream in self._request_streams.items():
                stream.put(exc)
                self.abort_request(rid)

    def process_request_output(self,
                               request_output: Union[
                                   RequestOutput, EmbeddingRequestOutput],
                               *,
                               verbose: bool = False) -> None:
        request_id = request_output.request_id
        if request_id not in self._request_streams:
            return
        self._request_streams[request_id].put(request_output)
        if request_output.finished:
            if verbose:
                logger.info("Finished request %s.", request_id)
            self.abort_request(request_id)

    def process_exception(self, request_id: str, exception: Exception,
                          *, verbose: bool = False) -> None:
        if verbose:
            logger.info("Finished request %s.", request_id)
        self.propagate_exception(exception, request_id)

    def add_request(self, request_id: str,
                    **engine_add_request_kwargs) -> AsyncStream:
        if request_id in self._request_streams:
            raise KeyError(f"Request {request_id} already exists.")
        stream = AsyncStream(request_id)
        self._new_requests.put_nowait(
            (stream, {"request_id": request_id,
                      **engine_add_request_kwargs}))
        self.new_requests_event.set()
        return stream

    def abort_request(self, request_id: str, *,
                      verbose: bool = False) -> None:
        if verbose:
            logger.info("Aborted request %s.", request_id)
        self._finished_requests.put_nowait(request_id)
        if request_id not in self._request_streams or \
                self._request_streams[request_id].finished:
            return
        self._request_streams[request_id].finish()

    def get_new_and_finished_requests(
            self) -> Tuple[List[dict], Set[str]]:
        new_requests: List[dict] = []
        finished_requests: Set[str] = set()

        while not self._finished_requests.empty():
            request_id = self._finished_requests.get_nowait()
            finished_requests.add(request_id)
            self._request_streams.pop(request_id, None)

        while not self._new_requests.empty():
            stream, new_request = self._new_requests.get_nowait()
            if stream.request_id in finished_requests:
                stream.finish()
                continue
            self._request_streams[stream.request_id] = stream
            new_requests.append(new_request)

        return new_requests, finished_requests

    async def wait_for_new_requests(self):
        if not self.has_new_requests():
            await self.new_requests_event.wait()
        self.new_requests_event.clear()

    def has_new_requests(self) -> bool:
        return not self._new_requests.empty()


class _AsyncLLMEngine(LLMEngine):
    """LLMEngine with an awaitable step (reference: :204)."""

    async def step_async(self) -> List[RequestOutput]:
        seq_group_metadata_list, scheduler_outputs = \
            self.scheduler.schedule()

        if not scheduler_outputs.is_empty():
            from vllm_legacy_tpu.sequence import ExecuteModelRequest
            request = ExecuteModelRequest(
                seq_group_metadata_list=seq_group_metadata_list,
                blocks_to_swap_in=scheduler_outputs.blocks_to_swap_in,
                blocks_to_swap_out=scheduler_outputs.blocks_to_swap_out,
                blocks_to_copy=scheduler_outputs.blocks_to_copy,
                num_lookahead_slots=scheduler_outputs.num_lookahead_slots,
                running_queue_size=scheduler_outputs.running_queue_size,
            )
            outputs = await self.model_executor.execute_model_async(
                request)
        else:
            outputs = []

        return self._process_model_outputs(outputs, scheduler_outputs)

    async def process_model_inputs_async(self, request_id: str,
                                         inputs: PromptInputs,
                                         lora_request=None) -> LLMInputs:
        if isinstance(inputs, str):
            inputs = {"prompt": inputs}
        if "prompt_token_ids" not in inputs:
            prompt_token_ids = await self.tokenizer.encode_async(
                inputs["prompt"], request_id=request_id,
                lora_request=lora_request)
        else:
            prompt_token_ids = inputs["prompt_token_ids"]
        return LLMInputs(prompt_token_ids=prompt_token_ids,
                         prompt=inputs.get("prompt"),
                         multi_modal_data=inputs.get("multi_modal_data"))

    async def add_request_async(self, request_id: str,
                                inputs: PromptInputs,
                                params: Union[SamplingParams,
                                              PoolingParams],
                                arrival_time: Optional[float] = None,
                                lora_request=None) -> None:
        if arrival_time is None:
            arrival_time = time.time()
        processed = await self.process_model_inputs_async(
            request_id, inputs, lora_request)
        # reuse the synchronous creation path
        self._add_processed_request(request_id, processed, params,
                                    arrival_time, lora_request)

    def _add_processed_request(self, request_id, processed, params,
                               arrival_time, lora_request) -> None:
        from vllm_legacy_tpu.sequence import Sequence, SequenceGroup
        if len(processed["prompt_token_ids"]) > \
                self.model_config.max_model_len:
            raise ValueError(
                f"Prompt length {len(processed['prompt_token_ids'])} "
                f"exceeds max_model_len "
                f"{self.model_config.max_model_len}")
        block_size = self.cache_config.block_size
        seq_id = next(self.seq_counter)
        eos_token_id = self._get_eos_token_id(lora_request)
        seq = Sequence(seq_id, processed.get("prompt"),
                       processed["prompt_token_ids"], block_size,
                       eos_token_id, lora_request)
        if isinstance(params, SamplingParams):
            params = params.clone()
            if params.max_tokens is None:
                params.max_tokens = max(
                    self.model_config.max_model_len -
                    seq.get_prompt_len(), 1)
            seq_group = SequenceGroup(request_id=request_id, seqs=[seq],
                                      arrival_time=arrival_time,
                                      sampling_params=params,
                                      lora_request=lora_request)
        else:
            seq_group = SequenceGroup(request_id=request_id, seqs=[seq],
                                      arrival_time=arrival_time,
                                      pooling_params=params,
                                      lora_request=lora_request)
        self.scheduler.add_seq_group(seq_group)

    async def check_health_async(self) -> None:
        self.model_executor.check_health()


class AsyncLLMEngine:
    """Background-loop wrapper used by the API servers (reference:
    :304)."""

    _engine_class: Type[_AsyncLLMEngine] = _AsyncLLMEngine

    def __init__(self, engine_config: EngineConfig, *,
                 log_requests: bool = True,
                 log_stats: bool = True,
                 max_log_len: Optional[int] = None) -> None:
        self.log_requests = log_requests
        self.max_log_len = max_log_len
        self.engine = self._engine_class(engine_config,
                                         log_stats=log_stats)
        self.background_loop: Optional[asyncio.Future] = None
        self._background_loop_unshielded: Optional[asyncio.Task] = None
        self.start_engine_loop = True
        self._errored_with: Optional[BaseException] = None
        self._request_tracker: Optional[RequestTracker] = None

    @classmethod
    def from_engine_args(cls, engine_args: AsyncEngineArgs,
                         start_engine_loop: bool = True
                         ) -> "AsyncLLMEngine":
        engine_config = engine_args.create_engine_config()
        engine = cls(engine_config,
                     log_requests=not engine_args.disable_log_requests,
                     log_stats=not engine_args.disable_log_stats,
                     max_log_len=engine_args.max_log_len)
        engine.start_engine_loop = start_engine_loop
        return engine

    @property
    def is_running(self) -> bool:
        return (self.background_loop is not None
                and self._background_loop_unshielded is not None
                and not self._background_loop_unshielded.done())

    @property
    def is_stopped(self) -> bool:
        return self.errored or (self.background_loop is not None and
                                self._background_loop_unshielded
                                is not None
                                and self._background_loop_unshielded.
                                done())

    @property
    def errored(self) -> bool:
        return self._errored_with is not None

    def set_errored(self, exc: Exception) -> None:
        self._errored_with = exc

    def _error_callback(self, exc: Exception) -> None:
        self.set_errored(exc)
        if self._request_tracker:
            self._request_tracker.propagate_exception(exc)

    def get_tokenizer(self):
        return self.engine.get_tokenizer()

    def start_background_loop(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop has errored already.") from \
                self._errored_with
        if self.is_running:
            raise RuntimeError("Background loop is already running.")
        self._request_tracker = RequestTracker()
        self._background_loop_unshielded = asyncio.get_event_loop(
        ).create_task(self.run_engine_loop())
        self._background_loop_unshielded.add_done_callback(
            partial(_log_task_completion,
                    error_callback=self._error_callback))
        self.background_loop = asyncio.shield(
            self._background_loop_unshielded)

    async def engine_step(self) -> bool:
        """One iteration; returns whether there is in-flight work."""
        new_requests, finished_requests = (
            self._request_tracker.get_new_and_finished_requests())

        for new_request in new_requests:
            try:
                await self.engine.add_request_async(**new_request)
            except ValueError as e:
                self._request_tracker.process_exception(
                    new_request["request_id"], e,
                    verbose=self.log_requests)

        if finished_requests:
            self.engine.abort_request(finished_requests)

        request_outputs = await self.engine.step_async()

        for request_output in request_outputs:
            self._request_tracker.process_request_output(
                request_output, verbose=self.log_requests)

        return len(request_outputs) > 0

    async def run_engine_loop(self):
        has_requests_in_progress = False
        while True:
            if not has_requests_in_progress:
                await self._request_tracker.wait_for_new_requests()
            try:
                has_requests_in_progress = await asyncio.wait_for(
                    self.engine_step(), ENGINE_ITERATION_TIMEOUT_S)
            except asyncio.TimeoutError as exc:
                logger.error(
                    "Engine iteration timed out. This should never "
                    "happen!")
                self.set_errored(exc)
                raise
            await asyncio.sleep(0)

    async def add_request(
        self,
        request_id: str,
        inputs: PromptInputs,
        params: Union[SamplingParams, PoolingParams],
        arrival_time: Optional[float] = None,
        lora_request=None,
    ) -> AsyncStream:
        if self.log_requests:
            shortened = inputs if isinstance(inputs, str) else \
                inputs.get("prompt")
            if self.max_log_len and shortened:
                shortened = shortened[:self.max_log_len]
            logger.info("Received request %s: prompt: %r", request_id,
                        shortened)
        if not self.is_running:
            if self.start_engine_loop:
                self.start_background_loop()
            else:
                raise AsyncEngineDeadError(
                    "Background loop is not running.")
        stream = self._request_tracker.add_request(
            request_id,
            inputs=inputs,
            params=params,
            arrival_time=arrival_time or time.time(),
            lora_request=lora_request)
        return stream

    async def generate(
        self,
        inputs: PromptInputs,
        sampling_params: SamplingParams,
        request_id: str,
        lora_request=None,
    ) -> AsyncIterator[RequestOutput]:
        """Yield streaming RequestOutputs for one request (reference:
        :533)."""
        stream = await self.add_request(request_id, inputs,
                                        sampling_params,
                                        lora_request=lora_request)
        try:
            async for request_output in stream:
                yield request_output
        except (Exception, asyncio.CancelledError) as e:
            self._abort(request_id)
            raise e

    async def encode(
        self,
        inputs: PromptInputs,
        pooling_params: PoolingParams,
        request_id: str,
        lora_request=None,
    ) -> AsyncIterator[EmbeddingRequestOutput]:
        stream = await self.add_request(request_id, inputs,
                                        pooling_params,
                                        lora_request=lora_request)
        try:
            async for request_output in stream:
                yield request_output
        except (Exception, asyncio.CancelledError) as e:
            self._abort(request_id)
            raise e

    async def abort(self, request_id: str) -> None:
        if not self.is_running:
            raise AsyncEngineDeadError(
                "Background loop is not running.")
        return self._abort(request_id)

    def _abort(self, request_id: str) -> None:
        self._request_tracker.abort_request(request_id,
                                            verbose=self.log_requests)

    async def get_model_config(self):
        return self.engine.get_model_config()

    async def check_health(self) -> None:
        t = time.perf_counter()
        logger.debug("Starting health check...")
        if self.is_stopped:
            raise AsyncEngineDeadError("Background loop is stopped.")
        await self.engine.check_health_async()
        logger.debug("Health check took %fs", time.perf_counter() - t)
