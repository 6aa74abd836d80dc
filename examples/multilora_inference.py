"""Multi-LoRA serving demo (reference:
examples/multilora_inference.py): several adapters served in one
batch, routed per request."""
from vllm_legacy_tpu import EngineArgs, LLMEngine, SamplingParams
from vllm_legacy_tpu.lora.request import LoRARequest

engine_args = EngineArgs(model="meta-llama/Llama-2-7b-hf",
                         enable_lora=True, max_loras=2,
                         max_lora_rank=8, max_num_seqs=64)
engine = LLMEngine.from_engine_args(engine_args)

sql_lora = LoRARequest("sql-lora", 1, "/path/to/sql-lora-adapter")
chat_lora = LoRARequest("chat-lora", 2, "/path/to/chat-adapter")

requests = [
    ("[user] Write a SQL query to answer: how many flights?",
     SamplingParams(temperature=0.0, max_tokens=128), sql_lora),
    ("Tell me a joke.",
     SamplingParams(temperature=0.8, max_tokens=128), chat_lora),
    ("The capital of France is",
     SamplingParams(temperature=0.0, max_tokens=32), None),  # base
]

for i, (prompt, params, lora) in enumerate(requests):
    engine.add_request(str(i), prompt, params, lora_request=lora)
while engine.has_unfinished_requests():
    for out in engine.step():
        if out.finished:
            print(out.outputs[0].text)
