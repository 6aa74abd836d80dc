import glob
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp, numpy as np
from vllm_legacy_tpu.testing_utils import (make_dummy_engine_config,
                                           tinyllama_1_1b_hf_config)
from vllm_legacy_tpu.worker.worker import Worker
from vllm_legacy_tpu.models.attention import AttentionMetadata
from vllm_legacy_tpu.layers.sampler import SamplingTensors

import os
BATCH = int(os.getenv('NS', '256'))
K = int(os.getenv('K', '32'))
cfg = make_dummy_engine_config(
    tinyllama_1_1b_hf_config(), dtype="bfloat16", max_model_len=528,
    max_num_seqs=BATCH, hbm_utilization=0.85, num_scheduler_steps=K)
worker = Worker(cfg); worker.load_model()
ntpu, _ = worker.determine_num_available_blocks()
worker.initialize_cache(ntpu, 128)
runner = worker.model_runner
caches = worker.cache_engine.gpu_cache
CTX, bs = 257, 16
nblk = CTX // bs + 2
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
with jax.profiler.trace("/tmp/jaxtrace_ms"):
    for _ in range(2):
        out = fn(runner.params, caches, tok, pos, md, sel, st, key)
        caches = out[0]
    jax.device_get(out[1].ravel()[0:1])
print("ok")
