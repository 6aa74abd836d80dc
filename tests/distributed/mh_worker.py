"""Subprocess entry for the 2-process multihost test.

Each process joins a localhost jax.distributed cluster with 2 virtual
CPU devices (4 global), builds the same tiny engine config, and:
  rank 0  drives an LLMEngine through MultihostTPUExecutor and prints
          the finished token ids as JSON on stdout;
  rank 1  mirrors the primary's worker calls via follower_serve.
"""
import json
import os
import sys

# Must precede any jax import: CPU platform + 2 local virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["VLT_PALLAS_INTERPRET"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = " ".join(
    f for f in flags.split()
    if "host_platform_device_count" not in f)

from vllm_legacy_tpu.parallel import multihost  # noqa: E402


def build_config():
    from vllm_legacy_tpu.testing_utils import (make_dummy_engine_config,
                                               tiny_llama_hf_config)
    return make_dummy_engine_config(
        tiny_llama_hf_config(),
        max_model_len=128,
        max_num_seqs=4,
        num_tpu_blocks_override=64,  # CPU-host test: keep KV tiny
        tensor_parallel_size=int(os.environ["MH_TP"]),
        data_parallel_size=int(os.environ["MH_DP"]),
        # MH_SWAP=1: per-host shard swap under artificial preemption
        swap_space_gb=float(os.environ.get("MH_SWAP", "0")),
    )


def main() -> None:
    rank = int(os.environ["MH_RANK"])
    nprocs = int(os.environ["MH_NPROCS"])
    port = os.environ["MH_PORT"]
    # The axon TPU plugin ignores JAX_PLATFORMS; force via config BEFORE
    # the distributed runtime initializes a backend.
    import jax
    jax.config.update("jax_platforms", "cpu")
    multihost.init_multihost(f"localhost:{port}", nprocs, rank,
                             local_device_count=2)

    cfg = build_config()
    if not multihost.is_primary():
        if os.environ.get("MH_BCAST_BENCH", "0") != "0":
            while True:  # mirror the primary's probe broadcasts
                op, _ = multihost.broadcast_msg()
                if op == "stop":
                    return
        multihost.follower_serve(cfg)
        return

    from vllm_legacy_tpu.engine.llm_engine import LLMEngine
    from vllm_legacy_tpu.parallel.multihost import MultihostTPUExecutor
    from vllm_legacy_tpu.sampling_params import SamplingParams

    if os.environ.get("MH_BCAST_BENCH", "0") != "0":
        # control-plane probe: time the per-step pickled broadcast with
        # a typical ExecuteModelRequest-sized payload (the multi-host
        # scaling risk at DCN latencies — measured, not guessed)
        import time
        payload = ("execute", {"seq": list(range(2000)),
                               "tables": [[0] * 32] * 16})
        for _ in range(5):
            multihost.broadcast_msg(payload)  # warm
        t0 = time.perf_counter()
        n = 200
        for _ in range(n):
            multihost.broadcast_msg(payload)
        per = (time.perf_counter() - t0) / n
        print(f"BCAST {per*1e6:.0f} us/step")
        multihost.broadcast_msg(("stop", None))
        return

    engine = LLMEngine(cfg, executor_class=MultihostTPUExecutor,
                       log_stats=False)
    if os.environ.get("MH_SWAP", "0") != "0":
        # beam groups (multi-seq) preempt by SWAP; artificial
        # preemption (VLT_TEST_ENABLE_ARTIFICIAL_PREEMPT in our env)
        # forces the per-host shard swap path while outputs must stay
        # exact vs a never-preempted single-process engine
        params = SamplingParams(temperature=0.0, use_beam_search=True,
                                best_of=2, max_tokens=8,
                                ignore_eos=True, detokenize=False)
    else:
        params = SamplingParams(temperature=0.0, max_tokens=8,
                                ignore_eos=True, detokenize=False)
    prompts = {
        "a": [11, 12, 13, 14, 15],
        "b": [7, 8, 9],
    }
    for rid, toks in prompts.items():
        engine.add_request(rid, {"prompt_token_ids": toks}, params)
    done = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done[out.request_id] = list(out.outputs[0].token_ids)
    engine.model_executor.stop_followers()
    print("RESULT " + json.dumps(done))


if __name__ == "__main__":
    main()
