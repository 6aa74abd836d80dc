"""Save a model in pre-sharded per-host files for fast reload
(reference: examples/save_sharded_state.py + ShardedStateLoader)."""
import argparse

from vllm_legacy_tpu import LLM

parser = argparse.ArgumentParser()
parser.add_argument("--model", required=True)
parser.add_argument("--quantization", default=None)
parser.add_argument("--output", required=True)
args = parser.parse_args()

llm = LLM(model=args.model, quantization=args.quantization)
# later: LLM(model=args.output, load_format="sharded_state")
llm.save_sharded_state(path=args.output)
