"""Async engine: per-request output streams over the synchronous engine.

Capability parity with the reference async engine
(vllm/engine/async_llm_engine.py: AsyncStream :52, RequestTracker :85,
run_engine_loop :513, step_async :204, dead-engine propagation :29-50).
The reference's Ray-remote engine option (engine_use_ray) has no TPU
analogue: the single-controller engine lives in-process, and the jitted
step releases the GIL while the chips run, which is all the concurrency
the event loop needs.

Design here: API handlers never touch the engine directly. They hand
work to an intake ledger (``RequestTracker``); one background task
drains the ledger, drives ``step_async`` and fans outputs back out to
the per-request ``AsyncStream``s. If that task ever dies, the error is
pushed into every open stream so callers fail fast instead of hanging.
"""
from __future__ import annotations

import asyncio
import time
from functools import partial
from typing import (AsyncIterator, Callable, Dict, List, Optional, Set,
                    Tuple, Type, Union)

from vllm_legacy_tpu import envs
from vllm_legacy_tpu.config import EngineConfig
from vllm_legacy_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_legacy_tpu.engine.llm_engine import LLMEngine
from vllm_legacy_tpu.inputs import LLMInputs, PromptInputs
from vllm_legacy_tpu.logger import init_logger
from vllm_legacy_tpu.outputs import EmbeddingRequestOutput, RequestOutput
from vllm_legacy_tpu.pooling_params import PoolingParams
from vllm_legacy_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)

ENGINE_ITERATION_TIMEOUT_S = envs.VLT_ENGINE_ITERATION_TIMEOUT_S

AnyOutput = Union[RequestOutput, EmbeddingRequestOutput]


class AsyncEngineDeadError(RuntimeError):
    """The background engine task has crashed; the server must restart."""


def _log_task_completion(task: asyncio.Task,
                         error_callback: Callable[[Exception],
                                                  None]) -> None:
    """Done-callback for the engine loop task. The loop is infinite, so
    *any* completion that isn't a cancellation is a crash: record it and
    wake every waiter."""
    try:
        returned = task.result()
    except asyncio.exceptions.CancelledError:
        return  # clean shutdown
    except KeyboardInterrupt:
        raise
    except Exception as e:
        logger.error("Engine background task failed", exc_info=e)
        error_callback(e)
        raise AsyncEngineDeadError(
            "Task finished unexpectedly. This should never happen! "
            "See stack trace above for the actual cause.") from e
    raise AssertionError(
        f"The engine background task should never finish without an "
        f"exception. {returned}")


class AsyncStream:
    """One request's output channel; the engine loop produces, exactly
    one API handler consumes (reference: :52). Closing enqueues a
    StopAsyncIteration sentinel so the consumer drains everything
    produced before the close."""

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._items: asyncio.Queue = asyncio.Queue()
        self.finished = False

    def put(self, item: Union[AnyOutput, Exception]) -> None:
        if not self.finished:
            self._items.put_nowait(item)

    def finish(self) -> None:
        self._items.put_nowait(StopAsyncIteration())
        self.finished = True

    def __aiter__(self):
        return self

    async def __anext__(self) -> AnyOutput:
        item = await self._items.get()
        if isinstance(item, (StopAsyncIteration, Exception)):
            raise item
        return item


class RequestTracker:
    """Intake ledger between API handlers and the engine loop
    (reference: :85).

    Handlers append to ``_arrivals`` / ``_departures``; the loop drains
    both at the top of each iteration with
    ``get_new_and_finished_requests``. Everything runs on one event
    loop, so plain lists + an asyncio.Event are enough — no queues, no
    locks.
    """

    def __init__(self) -> None:
        self._streams: Dict[str, AsyncStream] = {}
        self._arrivals: List[Tuple[AsyncStream, dict]] = []
        self._departures: List[str] = []
        self.new_requests_event = asyncio.Event()

    def __contains__(self, request_id) -> bool:
        return request_id in self._streams

    def __len__(self) -> int:
        return len(self._streams)

    def add_request(self, request_id: str,
                    **engine_add_request_kwargs) -> AsyncStream:
        if request_id in self._streams:
            raise KeyError(f"Request {request_id} already exists.")
        stream = AsyncStream(request_id)
        self._arrivals.append(
            (stream, {"request_id": request_id,
                      **engine_add_request_kwargs}))
        self.new_requests_event.set()
        return stream

    def abort_request(self, request_id: str, *,
                      verbose: bool = False) -> None:
        if verbose:
            logger.info("Aborted request %s.", request_id)
        # Always tell the engine loop — the request may already be
        # inside the scheduler even if its stream is gone.
        self._departures.append(request_id)
        stream = self._streams.get(request_id)
        if stream is not None and not stream.finished:
            stream.finish()

    def process_request_output(self, request_output: AnyOutput, *,
                               verbose: bool = False) -> None:
        stream = self._streams.get(request_output.request_id)
        if stream is None:
            return
        stream.put(request_output)
        if request_output.finished:
            if verbose:
                logger.info("Finished request %s.",
                            request_output.request_id)
            self.abort_request(request_output.request_id)

    def process_exception(self, request_id: str, exception: Exception, *,
                          verbose: bool = False) -> None:
        if verbose:
            logger.info("Finished request %s.", request_id)
        self.propagate_exception(exception, request_id)

    def propagate_exception(self, exc: Exception,
                            request_id: Optional[str] = None) -> None:
        """Deliver a failure to one stream, or (engine death) to all."""
        if request_id is not None:
            # Deliver BEFORE aborting: abort_request() finishes the
            # stream and a finished AsyncStream drops put() items, so
            # the other order silently swallows per-request errors
            # (matches the all-streams branch below and the reference
            # ordering in async_llm_engine.py propagate_exception).
            stream = self._streams.get(request_id)
            if stream is not None:
                stream.put(exc)
            self.abort_request(request_id)
            return
        for rid in list(self._streams):
            self._streams[rid].put(exc)
            self.abort_request(rid)

    def get_new_and_finished_requests(
            self) -> Tuple[List[dict], Set[str]]:
        """Drain both ledgers. An arrival that was aborted before the
        loop ever saw it is dropped here, not handed to the engine."""
        finished = set(self._departures)
        self._departures.clear()
        for rid in finished:
            self._streams.pop(rid, None)

        admitted: List[dict] = []
        for stream, request_kwargs in self._arrivals:
            if stream.request_id in finished:
                stream.finish()
                continue
            self._streams[stream.request_id] = stream
            admitted.append(request_kwargs)
        self._arrivals.clear()

        return admitted, finished

    def has_new_requests(self) -> bool:
        return bool(self._arrivals)

    async def wait_for_new_requests(self):
        if not self.has_new_requests():  # else: drain without sleeping
            await self.new_requests_event.wait()
        self.new_requests_event.clear()


class _AsyncLLMEngine(LLMEngine):
    """LLMEngine plus awaitable step/intake (reference: :204). The
    scheduling + output bookkeeping stay synchronous; only tokenization
    and the device step await."""

    async def step_async(self) -> List[RequestOutput]:
        metadata_list, scheduler_outputs = self.scheduler.schedule()
        request = self._wire_execute_request(metadata_list,
                                             scheduler_outputs)
        outputs = (await self.model_executor.execute_model_async(request)
                   if request is not None else [])
        return self._process_model_outputs(outputs, scheduler_outputs)

    async def process_model_inputs_async(self, request_id: str,
                                         inputs: PromptInputs,
                                         lora_request=None) -> LLMInputs:
        if isinstance(inputs, str):
            inputs = {"prompt": inputs}
        if "prompt_token_ids" in inputs:
            token_ids = inputs["prompt_token_ids"]
        else:
            token_ids = await self.tokenizer.encode_async(
                inputs["prompt"], request_id=request_id,
                lora_request=lora_request)
        return LLMInputs(prompt_token_ids=token_ids,
                         prompt=inputs.get("prompt"),
                         multi_modal_data=inputs.get("multi_modal_data"))

    async def add_request_async(self, request_id: str,
                                inputs: PromptInputs,
                                params: Union[SamplingParams,
                                              PoolingParams],
                                arrival_time: Optional[float] = None,
                                lora_request=None) -> None:
        processed = await self.process_model_inputs_async(
            request_id, inputs, lora_request)
        self._enqueue_processed_request(request_id, processed, params,
                                        arrival_time or time.time(),
                                        lora_request)

    async def check_health_async(self) -> None:
        self.model_executor.check_health()


class AsyncLLMEngine:
    """Public async facade used by the API servers (reference: :304):
    owns the engine, the tracker, and the background loop task."""

    _engine_class: Type[_AsyncLLMEngine] = _AsyncLLMEngine

    def __init__(self, engine_config: EngineConfig, *,
                 log_requests: bool = True,
                 log_stats: bool = True,
                 max_log_len: Optional[int] = None) -> None:
        self.log_requests = log_requests
        self.max_log_len = max_log_len
        self.engine = self._engine_class(engine_config,
                                         log_stats=log_stats)
        # Shielded handle handed to awaiters; the unshielded task is
        # what actually dies (and triggers error propagation).
        self.background_loop: Optional[asyncio.Future] = None
        self._background_loop_unshielded: Optional[asyncio.Task] = None
        self.start_engine_loop = True
        self._errored_with: Optional[BaseException] = None
        self._request_tracker: Optional[RequestTracker] = None

    @classmethod
    def from_engine_args(cls, engine_args: AsyncEngineArgs,
                         start_engine_loop: bool = True
                         ) -> "AsyncLLMEngine":
        engine = cls(engine_args.create_engine_config(),
                     log_requests=not engine_args.disable_log_requests,
                     log_stats=not engine_args.disable_log_stats,
                     max_log_len=engine_args.max_log_len)
        engine.start_engine_loop = start_engine_loop
        if getattr(engine_args, "prewarm_decode", False):
            # before the background loop starts: the sync engine is
            # idle and fully owned here
            engine.engine.prewarm_decode_buckets()
        return engine

    # ------------------------------------------------------- loop state

    @property
    def is_running(self) -> bool:
        task = self._background_loop_unshielded
        return (self.background_loop is not None and task is not None
                and not task.done())

    @property
    def is_stopped(self) -> bool:
        task = self._background_loop_unshielded
        return self.errored or (self.background_loop is not None
                                and task is not None and task.done())

    @property
    def errored(self) -> bool:
        return self._errored_with is not None

    def set_errored(self, exc: Exception) -> None:
        self._errored_with = exc

    def _error_callback(self, exc: Exception) -> None:
        # record first, then fail every open stream
        self.set_errored(exc)
        if self._request_tracker:
            self._request_tracker.propagate_exception(exc)

    def start_background_loop(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError(
                "Background loop has errored already.") from \
                self._errored_with
        if self.is_running:
            raise RuntimeError("Background loop is already running.")
        self._request_tracker = RequestTracker()
        task = asyncio.get_event_loop().create_task(
            self.run_engine_loop())
        task.add_done_callback(
            partial(_log_task_completion,
                    error_callback=self._error_callback))
        self._background_loop_unshielded = task
        self.background_loop = asyncio.shield(task)

    # --------------------------------------------------------- the loop

    async def engine_step(self) -> bool:
        """One loop iteration: drain intake, step, fan out outputs.
        Returns whether any request is still in flight."""
        arrivals, departures = (
            self._request_tracker.get_new_and_finished_requests())

        for request_kwargs in arrivals:
            try:
                await self.engine.add_request_async(**request_kwargs)
            except ValueError as e:
                # Bad request (e.g. over-long prompt): fail its stream,
                # keep the loop alive for everyone else.
                self._request_tracker.process_exception(
                    request_kwargs["request_id"], e,
                    verbose=self.log_requests)

        if departures:
            self.engine.abort_request(departures)

        outputs = await self.engine.step_async()
        for output in outputs:
            self._request_tracker.process_request_output(
                output, verbose=self.log_requests)
        return len(outputs) > 0

    async def run_engine_loop(self):
        busy = False
        while True:
            if not busy:
                # Idle: sleep until an API handler signals intake.
                await self._request_tracker.wait_for_new_requests()
            try:
                busy = await asyncio.wait_for(self.engine_step(),
                                              ENGINE_ITERATION_TIMEOUT_S)
            except asyncio.TimeoutError as exc:
                # Watchdog: a wedged device step must kill the loop (and
                # thereby every open stream), not hang clients forever.
                logger.error("Engine iteration timed out. This should "
                             "never happen!")
                self.set_errored(exc)
                raise
            await asyncio.sleep(0)  # let handlers run between steps

    # ----------------------------------------------------------- intake

    async def add_request(self, request_id: str, inputs: PromptInputs,
                          params: Union[SamplingParams, PoolingParams],
                          arrival_time: Optional[float] = None,
                          lora_request=None) -> AsyncStream:
        if self.log_requests:
            preview = inputs if isinstance(inputs, str) else \
                inputs.get("prompt")
            if self.max_log_len and preview:
                preview = preview[:self.max_log_len]
            logger.info("Received request %s: prompt: %r", request_id,
                        preview)
        if not self.is_running:
            if not self.start_engine_loop:
                raise AsyncEngineDeadError(
                    "Background loop is not running.")
            self.start_background_loop()
        return self._request_tracker.add_request(
            request_id,
            inputs=inputs,
            params=params,
            arrival_time=arrival_time or time.time(),
            lora_request=lora_request)

    async def _stream_request(self, request_id: str, inputs: PromptInputs,
                              params, lora_request) -> AsyncIterator:
        """Shared generate/encode body (reference: :533). A consumer
        failure or disconnect aborts the request so the engine stops
        spending steps on it."""
        stream = await self.add_request(request_id, inputs, params,
                                        lora_request=lora_request)
        try:
            async for output in stream:
                yield output
        except (Exception, asyncio.CancelledError):
            self._abort(request_id)
            raise

    def generate(self, inputs: PromptInputs,
                 sampling_params: SamplingParams, request_id: str,
                 lora_request=None) -> AsyncIterator[RequestOutput]:
        return self._stream_request(request_id, inputs, sampling_params,
                                    lora_request)

    def encode(self, inputs: PromptInputs, pooling_params: PoolingParams,
               request_id: str, lora_request=None
               ) -> AsyncIterator[EmbeddingRequestOutput]:
        return self._stream_request(request_id, inputs, pooling_params,
                                    lora_request)

    async def abort(self, request_id: str) -> None:
        if not self.is_running:
            raise AsyncEngineDeadError("Background loop is not running.")
        return self._abort(request_id)

    def _abort(self, request_id: str) -> None:
        self._request_tracker.abort_request(request_id,
                                            verbose=self.log_requests)

    # ---------------------------------------------------- introspection

    def get_tokenizer(self):
        return self.engine.get_tokenizer()

    async def get_model_config(self):
        return self.engine.get_model_config()

    async def check_health(self) -> None:
        started = time.perf_counter()
        if self.is_stopped:
            raise AsyncEngineDeadError("Background loop is stopped.")
        await self.engine.check_health_async()
        logger.debug("Health check took %fs",
                     time.perf_counter() - started)
