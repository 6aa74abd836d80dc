"""Embedding model demo (reference:
examples/offline_inference_embedding.py)."""
from vllm_legacy_tpu import LLM

prompts = [
    "Hello, my name is",
    "The president of the United States is",
    "The capital of France is",
]

model = LLM(model="intfloat/e5-mistral-7b-instruct",
            enforce_eager=True)
outputs = model.encode(prompts)
for output in outputs:
    print(len(output.outputs.embedding))  # hidden-size floats
