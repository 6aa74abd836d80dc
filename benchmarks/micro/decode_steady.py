"""Steady-state decode step timing: K on-device steps per dispatch.

Times ONLY the jitted multi-step decode fn (no scheduler/host prep) at
a given batch/context/block-size, to bound the device-side decode cost
that bench.py's engine loop amortizes. Env: NS (batch), K (multistep),
CTX, BLOCK_SIZE, VLT_PACKED_KV."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import time
import jax, jax.numpy as jnp, numpy as np
from vllm_legacy_tpu.testing_utils import (make_dummy_engine_config,
                                           tinyllama_1_1b_hf_config)
from vllm_legacy_tpu.worker.worker import Worker
from vllm_legacy_tpu.models.attention import AttentionMetadata
from vllm_legacy_tpu.layers.sampler import SamplingTensors

BATCH = int(os.getenv('NS', '256'))
K = int(os.getenv('K', '32'))
CTX = int(os.getenv('CTX', '384'))
BS = int(os.getenv('BLOCK_SIZE', '16'))
cfg = make_dummy_engine_config(
    tinyllama_1_1b_hf_config(), dtype="bfloat16", max_model_len=544,
    max_num_seqs=BATCH, hbm_utilization=0.85, num_scheduler_steps=K,
    block_size=BS)
worker = Worker(cfg); worker.load_model()
ntpu, _ = worker.determine_num_available_blocks()
worker.initialize_cache(ntpu, 128)
runner = worker.model_runner
caches = worker.cache_engine.gpu_cache
nblk = CTX // BS + 2
tables_np = np.zeros((BATCH, runner.max_blocks_per_seq), np.int32)
for i in range(BATCH):
    tables_np[i, :nblk] = (np.arange(i*nblk, (i+1)*nblk) % (ntpu-1)) + 1
md = AttentionMetadata(jnp.asarray(np.zeros(BATCH, np.int32)),
                       jnp.asarray(tables_np),
                       jnp.asarray(np.full(BATCH, CTX, np.int32)),
                       jnp.asarray(np.ones(BATCH, np.int32)))
tok = jnp.ones((BATCH, 1), jnp.int32)
pos = jnp.full((BATCH, 1), CTX-1, jnp.int32)
sel = jnp.arange(BATCH, dtype=jnp.int32)
st = SamplingTensors.from_lists(
    [0.0]*BATCH, [1.0]*BATCH, [0]*BATCH, [0.0]*BATCH, [0.0]*BATCH,
    [0.0]*BATCH, [1.0]*BATCH, [True]*BATCH, [0]*BATCH,
    seed_positions=[0]*BATCH, prompt_tokens=[], output_tokens=[],
    pad_to=BATCH)
fn = runner._get_step_fn((False, False, False, True), 0, K)
key = jax.random.PRNGKey(0)
out = fn(runner.params, caches, tok, pos, md, sel, st, key)
caches = out[0]
jax.device_get(out[1].ravel()[0:1])
N = 4
t0 = time.perf_counter()
for _ in range(N):
    out = fn(runner.params, caches, tok, pos, md, sel, st, key)
    caches = out[0]
jax.device_get(out[1].ravel()[0:1])
dt = (time.perf_counter() - t0) / (N * K)
print(f"batch={BATCH} ctx={CTX} bs={BS} K={K} "
      f"decode_ms_per_step={dt*1e3:.2f} tok/s={BATCH/dt:.0f}")
