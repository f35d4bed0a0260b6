"""OpenAI-compatible client example against the serving endpoint
(reference examples/openai_completion_client.py)."""
import json
import urllib.request

BASE = "http://localhost:8000"


def post(path, body):
    req = urllib.request.Request(
        BASE + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


print(post("/v1/completions", {
    "model": "default", "prompt": "San Francisco is a", "max_tokens": 24,
    "temperature": 0.7,
}))
print(post("/v1/chat/completions", {
    "model": "default",
    "messages": [{"role": "user", "content": "Hello!"}],
    "max_tokens": 24,
}))
