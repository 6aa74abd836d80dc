"""Time the engine step phases (schedule / execute / process) on real TPU."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time

from vllm_legacy_tpu.engine.llm_engine import LLMEngine
from vllm_legacy_tpu.sampling_params import SamplingParams
from vllm_legacy_tpu.testing_utils import (make_dummy_engine_config,
                                           tinyllama_1_1b_hf_config)

import os
NUM_SEQS = int(os.getenv('NS', '256'))
IN, OUT = 256, 256
K = int(os.getenv('K', '32'))

cfg = make_dummy_engine_config(
    tinyllama_1_1b_hf_config(), dtype="bfloat16",
    max_model_len=IN + OUT + 16, max_num_seqs=NUM_SEQS,
    hbm_utilization=0.85, num_scheduler_steps=K,
    max_num_batched_tokens=8192)
engine = LLMEngine(cfg, log_stats=False)

sp = SamplingParams(temperature=0.0, max_tokens=OUT, ignore_eos=True)
for i in range(NUM_SEQS):
    engine.add_request(str(i), {"prompt_token_ids": list(range(10, 10 + IN))},
                       sp)

t_sched = t_exec = t_proc = 0.0
nsteps = 0
t_all = time.perf_counter()
while engine.has_unfinished_requests():
    t0 = time.perf_counter()
    seq_group_metadata_list, scheduler_outputs = engine.scheduler.schedule()
    t1 = time.perf_counter()
    if not scheduler_outputs.is_empty():
        from vllm_legacy_tpu.sequence import ExecuteModelRequest
        request = ExecuteModelRequest(
            seq_group_metadata_list=seq_group_metadata_list,
            blocks_to_swap_in=scheduler_outputs.blocks_to_swap_in,
            blocks_to_swap_out=scheduler_outputs.blocks_to_swap_out,
            blocks_to_copy=scheduler_outputs.blocks_to_copy,
            num_lookahead_slots=scheduler_outputs.num_lookahead_slots,
            running_queue_size=scheduler_outputs.running_queue_size)
        outputs = engine.model_executor.execute_model(request)
    else:
        outputs = []
    t2 = time.perf_counter()
    engine._process_model_outputs(outputs, scheduler_outputs)
    t3 = time.perf_counter()
    t_sched += t1 - t0
    t_exec += t2 - t1
    t_proc += t3 - t2
    nsteps += 1
t_total = time.perf_counter() - t_all

toks = NUM_SEQS * OUT
print(f"steps={nsteps} total={t_total:.2f}s  out_tok/s={toks/t_total:.0f}")
print(f"schedule {t_sched:7.2f}s  ({t_sched/nsteps*1e3:6.1f} ms/step)")
print(f"execute  {t_exec:7.2f}s  ({t_exec/nsteps*1e3:6.1f} ms/step)")
print(f"process  {t_proc:7.2f}s  ({t_proc/nsteps*1e3:6.1f} ms/step)")
