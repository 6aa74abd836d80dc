"""OpenAI SDK against the server (reference:
examples/openai_completion_client.py)."""
from openai import OpenAI

client = OpenAI(api_key="EMPTY", base_url="http://localhost:8000/v1")
model = client.models.list().data[0].id

completion = client.completions.create(
    model=model, prompt="A robot may not injure a human being",
    echo=False, n=2, logprobs=3, max_tokens=32)
print("Completion results:", completion)
