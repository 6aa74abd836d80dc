"""Prefix caching demo (reference:
examples/offline_inference_with_prefix.py): a long shared prefix is
computed once; later requests hit the content-hash block cache."""
from vllm_legacy_tpu import LLM, SamplingParams

prefix = (
    "You are an expert school principal, skilled in effectively "
    "managing faculty and staff. Draft 10-15 questions for a potential "
    "first grade Head Teacher for my K-12, all-girls', independent "
    "school that emphasizes community, joyful discovery, and life-long "
    "learning. The candidate is coming in for a first-round panel "
    "interview for a 8th grade Math teaching role. They have 5 years "
    "of previous teaching experience as an assistant teacher at a "
    "co-ed, public school with experience in middle school math "
    "teaching. Based on these information, fulfill the following "
    "paragraph: ")

prompts = [
    prefix + "Hello, my name is",
    prefix + "The president of the United States is",
    prefix + "The capital of France is",
]

llm = LLM(model="TinyLlama/TinyLlama-1.1B-Chat-v1.0",
          enable_prefix_caching=True)
sampling_params = SamplingParams(temperature=0.0)

# first generation populates the prefix blocks
print(llm.generate(prompts[:1], sampling_params)[0].outputs[0].text)
# subsequent generations reuse them (faster time-to-first-token)
for out in llm.generate(prompts[1:], sampling_params):
    print(out.outputs[0].text)
