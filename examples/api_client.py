"""Client for the simple /generate API server (reference:
examples/api_client.py)."""
import argparse
import json

import requests

parser = argparse.ArgumentParser()
parser.add_argument("--host", default="localhost")
parser.add_argument("--port", type=int, default=8000)
parser.add_argument("--prompt", default="San Francisco is a")
parser.add_argument("--stream", action="store_true")
args = parser.parse_args()

response = requests.post(
    f"http://{args.host}:{args.port}/generate",
    json={"prompt": args.prompt, "max_tokens": 64, "temperature": 0.0,
          "stream": args.stream},
    stream=args.stream)
if args.stream:
    for chunk in response.iter_lines(delimiter=b"\0"):
        if chunk:
            print(json.loads(chunk)["text"])
else:
    print(json.loads(response.content)["text"])
