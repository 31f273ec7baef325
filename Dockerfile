# vllm-i64-tpu serving image (TPU VM base; CPU fallback for dev)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY vllm_i64_tpu ./vllm_i64_tpu
COPY csrc ./csrc
COPY bench.py eval_ablations.py ./

# TPU hosts: replace with jax[tpu] -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir -e . \
    "jax[cpu]" aiohttp safetensors tokenizers jinja2 prometheus-client

EXPOSE 8000 9090
ENTRYPOINT ["vllm-i64-tpu"]
CMD ["serve", "--no-model", "--port", "8000"]
