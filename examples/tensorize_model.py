"""Serialize a checkpoint with tensorizer for streamed loading
(reference: examples/tensorize_vllm_model.py). Requires the external
`tensorizer` package (same gate as the reference)."""
import argparse

from vllm_legacy_tpu.model_loader.tensorizer import serialize_params
from vllm_legacy_tpu.model_loader.weight_utils import (iterate_weights,
                                                       resolve_weight_files)

parser = argparse.ArgumentParser()
parser.add_argument("--model", required=True, help="HF checkpoint dir")
parser.add_argument("--output", required=True, help=".tensors path")
parser.add_argument("--encryption-key", default=None)
args = parser.parse_args()

files, fmt = resolve_weight_files(args.model, "auto")
serialize_params(iterate_weights(files, fmt), args.output,
                 encryption_key=args.encryption_key)
print(f"wrote {args.output}; load with "
      "LLM(model=..., load_format='tensorizer')")
