"""Phi-3-Vision via the out-of-band HD image encoder (reference:
examples/phi3v_example.py; see models/phi3v.py for the serving
contract)."""
import numpy as np
from transformers import CLIPVisionConfig

from vllm_legacy_tpu import LLM, SamplingParams
from vllm_legacy_tpu.engine.image_encoder import (ImageEncoder,
                                                  splice_images)
from vllm_legacy_tpu.model_loader.weight_utils import (iterate_weights,
                                                       resolve_weight_files)

MODEL = "microsoft/Phi-3-vision-128k-instruct"
llm = LLM(model=MODEL, max_model_len=4096)
tok = llm.get_tokenizer()

# vision tower weights load into the encoder, not the LM
clip_cfg = CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                            num_hidden_layers=24, num_attention_heads=16,
                            image_size=336, patch_size=14)
enc = ImageEncoder(clip_cfg,
                   lm_hidden=llm.llm_engine.model_config.hf_config.
                   hidden_size, select_layer=-2, hd_num=16)
files, fmt = resolve_weight_files(MODEL, "auto")
enc.load_weights(
    (n, w) for n, w in iterate_weights(files, fmt)
    if "vision_embed_tokens" in n)

image = np.asarray(...)  # [H, W, 3] uint8 / float
MARKER = tok.convert_tokens_to_ids("<|placeholder1|>")
ids = tok.encode("<|user|>\n<|placeholder1|>\nWhat is shown?"
                 "<|end|>\n<|assistant|>\n")
inputs = splice_images(ids, [enc.encode(image)],
                       placeholder_token_id=tok.pad_token_id or 0,
                       marker_token_id=MARKER)
out = llm.generate(prompts=[inputs],
                   sampling_params=SamplingParams(temperature=0.0,
                                                  max_tokens=64))[0]
print(out.outputs[0].text)
