"""Embeddings endpoint client (reference:
examples/openai_embedding_client.py)."""
from openai import OpenAI

client = OpenAI(api_key="EMPTY", base_url="http://localhost:8000/v1")
model = client.models.list().data[0].id

responses = client.embeddings.create(input=[
    "Hello my name is", "The best thing about vLLM is that it "
    "supports many different models"
], model=model)
for data in responses.data:
    print(len(data.embedding))
