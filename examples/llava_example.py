"""LLaVA multimodal inference (reference: examples/llava_example.py):
the prompt carries image_feature_size image tokens; pixel values ride
multi_modal_data."""
import numpy as np

from vllm_legacy_tpu import LLM, SamplingParams

llm = LLM(model="llava-hf/llava-1.5-7b-hf")
cfg = llm.llm_engine.model_config.hf_config
n_feat = (cfg.vision_config.image_size //
          cfg.vision_config.patch_size)**2

prompt = ("USER: " + "<image>" * n_feat +
          "\nWhat is the content of this image?\nASSISTANT:")
pixels = np.zeros((1, 3, cfg.vision_config.image_size,
                   cfg.vision_config.image_size), np.float32)

out = llm.generate(
    prompts=[{
        "prompt": prompt,
        "multi_modal_data": {"pixel_values": pixels},
    }],
    sampling_params=SamplingParams(temperature=0.0, max_tokens=64))[0]
print(out.outputs[0].text)
