"""tts-server — OpenAI-compatible HTTP TTS server.

Parity: reference examples/server/server.cpp: routes GET /, /health,
/v1/models, /v1/audio/voices, POST /v1/audio/speech and
/v1/audio/conditional-prompt; multi-model directories with per-request
`model` selection; per-request sampling overrides; WAV/AIFF responses;
OpenAI-style error JSON; LOADING-state 503; worker pool with a task queue.

Architecture notes vs the reference: the reference scales with
`--n-parallelism` full model REPLICAS each on its own thread
(server.cpp:885-897). Here workers share one loaded model per model-id by
default (jitted functions are reentrant; XLA serializes on-device work), so
N workers cost one copy of the weights — the replica knob instead controls
request-level concurrency. With --batch-slots N, Parler requests are routed
through the on-device continuous-batching engine instead: concurrent HTTP
requests decode TOGETHER in one compiled program (one weight read serves all
slots; see runtime/batched_parler.py).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from ..audio.wav import encode_aiff, encode_wav
from ..common import GenerationConfig
from ..models.registry import runner_from_file
from ..ops import sampling

MIMETYPE_JSON = "application/json; charset=utf-8"
MIMETYPE_WAV = "audio/wav"
MIMETYPE_AIFF = "audio/aiff"
MIMETYPE_HTML = "text/html; charset=utf-8"

ERROR_TYPES = {
    400: "invalid_request_error",
    401: "authentication_error",
    403: "permission_error",
    404: "not_found_error",
    500: "server_error",
    501: "not_supported_error",
    503: "unavailable_error",
}

# embedded web UI (reference ships public/index.html via xxd; this is the
# TPU-era equivalent — a single-page form over the OpenAI-style API)
INDEX_HTML = """<!doctype html>
<html><head><title>tts_tpu server</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:720px;margin:2rem auto;padding:0 1rem}
 textarea{width:100%;height:6rem} select,input,button{margin:.25rem 0;padding:.4rem}
 .row{display:flex;gap:1rem;flex-wrap:wrap} .row>div{flex:1;min-width:10rem}
 audio{width:100%;margin-top:1rem}
</style></head>
<body>
<h1>tts_tpu</h1>
<p>TPU-native text-to-speech. POST <code>/v1/audio/speech</code> with
<code>{"input": "...", "voice": "...", "model": "..."}</code>; GET
<code>/v1/models</code>, <code>/v1/audio/voices</code>, <code>/health</code>.</p>
<textarea id="text">The quick brown fox jumps over the lazy dog.</textarea>
<div class="row">
 <div><label>Model</label><br><select id="model"></select></div>
 <div><label>Voice</label><br><select id="voice"></select></div>
 <div><label>Temperature</label><br><input id="temp" type="number" step="0.05" value="1.0"></div>
 <div><label>Top-k</label><br><input id="topk" type="number" value="50"></div>
</div>
<button id="go">Generate</button> <span id="status"></span>
<audio id="player" controls></audio>
<script>
async function boot(){
 const models=await (await fetch('/v1/models')).json();
 for(const m of models.data){model.add(new Option(m.id,m.id));}
 const voices=await (await fetch('/v1/audio/voices')).json();
 const vs=(voices.voices[model.value]||[]);
 voice.innerHTML=''; voice.add(new Option('(default)',''));
 for(const v of vs){voice.add(new Option(v,v));}
}
go.onclick=async()=>{
 status.textContent='generating…';
 const body={input:text.value,temperature:parseFloat(temp.value),
             top_k:parseInt(topk.value),model:model.value};
 if(voice.value)body.voice=voice.value;
 const r=await fetch('/v1/audio/speech',{method:'POST',body:JSON.stringify(body)});
 if(!r.ok){status.textContent='error: '+await r.text();return;}
 player.src=URL.createObjectURL(await r.blob());player.play();
 status.textContent='done';
};
boot();
</script></body></html>"""


def format_error(message: str, code: int) -> dict:
    return {"error": {"code": code, "message": message,
                      "type": ERROR_TYPES.get(code, "server_error")}}


class ServerTask:
    def __init__(self, prompt: str, config: GenerationConfig, model: str,
                 stream_q: "queue.Queue | None" = None):
        self.id = uuid.uuid4().hex
        self.prompt = prompt
        self.config = config
        self.model = model
        self.event = threading.Event()
        self.success = False
        self.message = ""
        self.audio: Optional[np.ndarray] = None
        self.sample_rate = 0
        # streaming requests get audio chunks pushed here (None = end);
        # non-stream requests leave it None
        self.stream_q = stream_q


BATCHABLE_ARCHS = ("parler-tts", "orpheus", "dia")


class BatchedModelWorker:
    """Continuous-batching dispatcher for one Parler, Orpheus, or Dia model.

    Requests from many HTTP connections decode TOGETHER in one on-device
    program (runtime/batched_parler.py / runtime/batched_llama.py) — one
    weight read serves every active slot, so aggregate throughput scales
    with concurrency instead of the reference's full-replica-per-thread
    model (server.cpp:885-897; the reference cannot batch Orpheus at all).
    """

    def __init__(self, runner, n_slots: int, chunk: int = 32):
        self.runner = runner
        self.arch = getattr(runner, "arch", "")
        if self.arch == "orpheus":
            from ..runtime.batched_llama import BatchedLlamaEngine
            self.engine = BatchedLlamaEngine(
                runner.cfg, runner.weights, runner.tokenizer,
                n_slots=n_slots, chunk=chunk)
        elif self.arch == "dia":
            from ..runtime.batched_dia import BatchedDiaEngine
            self.engine = BatchedDiaEngine(
                runner.cfg, runner.weights, n_slots=n_slots, chunk=chunk)
        else:
            from ..runtime.batched_parler import BatchedParlerEngine
            self.engine = BatchedParlerEngine(
                runner.cfg, runner.weights, runner.tokenizer,
                n_slots=n_slots, chunk=chunk)
        self.q: "queue.Queue[ServerTask]" = queue.Queue()
        self.tasks: Dict[int, ServerTask] = {}
        # per-streaming-request incremental vocode state (worker thread
        # only): rid -> {"emitted": frames, "noise": ..., "dead": bool}
        self.streams: Dict[int, dict] = {}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tts-batched-worker")
        self._thread.start()

    def submit(self, task: "ServerTask") -> None:
        self.q.put(task)

    def refresh_weights(self) -> None:
        """Pick up runner weight changes (conditional-prompt updates)."""
        self.engine.weights = self.runner.weights

    def _busy(self) -> bool:
        return bool(self.engine.pending) or bool(self.engine.errors) or any(
            r is not None for r in self.engine.slot_req)

    def _drain_errors(self) -> None:
        """Deliver per-request engine failures (a bad request recorded by
        _fill_slots fails only itself, never the other in-flight slots)."""
        for rid, msg in list(self.engine.errors.items()):
            del self.engine.errors[rid]
            self.streams.pop(rid, None)
            t = self.tasks.pop(rid, None)
            if t is not None:
                t.message = msg
                t.success = False
                if t.stream_q is not None:
                    t.stream_q.put(None)
                t.event.set()

    def _loop(self) -> None:
        from ..common import SAMPLE_RATE_DAC
        while True:
            # drain incoming requests; block only when fully idle
            try:
                task = self.q.get(block=not self._busy())
            except queue.Empty:
                task = None
            while task is not None:
                try:
                    rid = self.engine.submit(task.prompt, task.config)
                    self.tasks[rid] = task
                    if task.stream_q is not None:
                        self.streams[rid] = {"emitted": 0, "noise": None,
                                             "dead": False}
                except Exception as e:  # noqa: BLE001
                    task.message = str(e)
                    task.success = False
                    if task.stream_q is not None:
                        task.stream_q.put(None)
                    task.event.set()
                try:
                    task = self.q.get(block=False)
                except queue.Empty:
                    task = None
            self._drain_errors()
            if not self._busy():
                continue
            try:
                finished = self.engine.step()
            except Exception as e:  # noqa: BLE001
                for t in self.tasks.values():
                    t.message = str(e)
                    t.success = False
                    if t.stream_q is not None:
                        t.stream_q.put(None)
                    t.event.set()
                self.tasks.clear()
                self.streams.clear()
                continue
            # incremental streaming: drain freshly decoded tokens of
            # in-flight streaming slots into their PCM queues
            for rid, ss in list(self.streams.items()):
                if rid in finished or ss["dead"]:
                    continue
                t = self.tasks.get(rid)
                got = self.engine.peek(rid)
                if t is None or got is None:
                    continue
                try:
                    self._stream_segment(t, ss, got[0], got[1], done=False)
                except Exception:  # noqa: BLE001 — fall back to final-only
                    ss["dead"] = True
            for rid in finished:
                t = self.tasks.pop(rid, None)
                codes = self.engine.results.pop(rid, None)
                ss = self.streams.pop(rid, None)
                if t is None:
                    continue
                try:
                    if ss is not None:
                        self._stream_final(t, ss, codes)
                        t.success = True
                    else:
                        t.audio, t.sample_rate = self._vocode(t, codes)
                        t.success = True
                except Exception as e:  # noqa: BLE001
                    t.message = str(e)
                    t.success = False
                if t.stream_q is not None:
                    t.stream_q.put(None)
                t.event.set()

    STREAM_MARGIN = 16  # vocoder receptive-field context frames

    def _stream_segment(self, task, ss, n, out, done):
        """Incrementally vocode the freshly decoded span of a streaming
        slot (worker thread). `out` is the raw out_tokens row; per-arch
        delay-undo happens here each chunk (cheap, host-side)."""
        if self.arch == "orpheus":
            from ..models.orpheus.model import prepare_output_tokens
            self._stream_push_snac(
                task, ss, prepare_output_tokens(np.asarray(out), int(n)),
                done)
        else:
            if self.arch == "dia":
                from ..models.dia.model import adjust_output_tokens as adj
            else:
                from ..models.parler.model import adjust_output_tokens as adj
            self._stream_push_dac(
                task, ss, adj(np.asarray(out), int(n), self.runner.cfg),
                done)

    def _stream_final(self, task, ss, codes):
        if codes is None:
            return
        if self.arch == "orpheus":
            self._stream_push_snac(task, ss, codes, True)
        else:
            self._stream_push_dac(task, ss, codes, True)

    def _stream_push_dac(self, task, ss, codes, done):
        from ..common import SAMPLE_RATE_DAC
        dac = self.runner.dac
        task.sample_rate = SAMPLE_RATE_DAC
        if dac is None or codes is None or codes.shape[0] == 0:
            return
        m = self.STREAM_MARGIN
        total = codes.shape[0]
        ready = total if done else max(0, total - m)
        if ready <= ss["emitted"]:
            return
        lo = max(0, ss["emitted"] - m)
        hi = total if done else min(total, ready + m)
        up = dac.cfg.up_sampling_factor
        seg = np.asarray(dac.decode(codes[lo:hi]), np.float32)
        self._stream_push(task, ss,
                          seg[(ss["emitted"] - lo) * up:(ready - lo) * up])
        ss["emitted"] = ready

    def _stream_push_snac(self, task, ss, heads, done):
        from ..common import SAMPLE_RATE_SNAC
        from ..models.codec.snac import make_noise_layers
        snac = self.runner.snac
        task.sample_rate = SAMPLE_RATE_SNAC
        if snac is None or heads is None or not heads[2]:
            return
        cfg = self.runner.cfg
        if ss["noise"] is None:
            seed = task.config.seed if task.config.seed is not None else \
                np.random.randint(2 ** 31)
            ss["noise"] = make_noise_layers(
                snac.cfg, seed, 4 * (cfg.max_generation_size // 7 + 1))
        cb = snac.weights.quantizers[0].codebook.shape[0]
        m = self.STREAM_MARGIN
        t = len(heads[2])
        ready = t if done else max(0, t - m)
        ready -= ready % 4
        if ready <= ss["emitted"]:
            return
        lo = max(0, ss["emitted"] - m)
        lo -= lo % 4
        hi = t if done else min(t, ready + m)
        hi -= hi % 4
        seg_heads = [
            np.clip(np.asarray(heads[0][lo // 4:hi // 4], np.int64),
                    0, cb - 1).tolist(),
            np.clip(np.asarray(heads[1][lo // 2:hi // 2], np.int64),
                    0, cb - 1).tolist(),
            np.clip(np.asarray(heads[2][lo:hi], np.int64),
                    0, cb - 1).tolist()]
        up = snac.cfg.up_sampling_factor
        seg = np.asarray(snac.decode(seg_heads, noise_layers=ss["noise"],
                                     frame_offset=lo), np.float32)
        self._stream_push(task, ss,
                          seg[(ss["emitted"] - lo) * up:(ready - lo) * up])
        ss["emitted"] = ready

    def _stream_push(self, task, ss, chunk):
        if chunk.size == 0 or ss["dead"]:
            return
        try:
            task.stream_q.put_nowait(chunk)
        except queue.Full:  # client stopped draining; don't block decode
            ss["dead"] = True

    def _vocode(self, task: "ServerTask", codes):
        from ..common import SAMPLE_RATE_DAC, SAMPLE_RATE_SNAC
        if self.arch == "orpheus":
            snac = self.runner.snac
            if snac is None or codes is None or not codes[2]:
                return np.zeros(0, np.float32), SAMPLE_RATE_SNAC
            # mirror OrpheusRunner.generate's SNAC path: clip codebook ids,
            # position-stable noise keyed by the request seed
            from ..models.codec.snac import make_noise_layers
            cfg = self.runner.cfg
            cb = snac.weights.quantizers[0].codebook.shape[0]
            heads = [np.clip(np.asarray(h, np.int64), 0, cb - 1).tolist()
                     for h in codes]
            seed = task.config.seed if task.config.seed is not None else \
                np.random.randint(2 ** 31)
            noise = make_noise_layers(
                snac.cfg, seed, 4 * (cfg.max_generation_size // 7 + 1))
            wav = snac.decode(heads, noise_layers=noise)
            return np.asarray(wav, np.float32), SAMPLE_RATE_SNAC
        if self.runner.dac is not None and codes is not None \
                and codes.shape[0] > 0:
            return (np.asarray(self.runner.dac.decode(codes), np.float32),
                    SAMPLE_RATE_DAC)
        return np.zeros(0, np.float32), SAMPLE_RATE_DAC


class TTSServer:
    def __init__(self, model_map: Dict[str, str], default_model: str,
                 default_config: GenerationConfig, n_parallel: int = 1,
                 text_encoder_path: str = "", timeout: float = 300.0,
                 batch_slots: int = 0):
        self.model_map = model_map
        self.default_model = default_model
        self.default_config = default_config
        self.n_parallel = max(1, n_parallel)
        self.batch_slots = batch_slots
        self.batched_workers: Dict[str, BatchedModelWorker] = {}
        self.text_encoder_path = text_encoder_path
        self.timeout = timeout
        self.state = "LOADING"
        self.runners: Dict[str, object] = {}
        self.queue: "queue.Queue[ServerTask]" = queue.Queue()
        self.workers = []
        self.created = int(time.time())
        self._lock = threading.Lock()
        # admission control for streaming requests: streams bypass the task
        # queue (they hold their HTTP connection) but must not oversubscribe
        # the device — at most n_parallel concurrent streams
        self.stream_slots = threading.Semaphore(self.n_parallel)
        # observability counters (GET /metrics); reference has none
        self.metrics = {
            "requests_total": 0, "requests_failed": 0,
            "streams_total": 0, "streams_rejected": 0,
            "audio_seconds_total": 0.0, "wall_seconds_total": 0.0,
        }

    def record(self, task: "ServerTask", wall_s: float) -> None:
        with self._lock:
            self.metrics["requests_total"] += 1
            if not task.success:
                self.metrics["requests_failed"] += 1
            elif task.audio is not None and task.sample_rate:
                self.metrics["audio_seconds_total"] += (
                    len(task.audio) / task.sample_rate)
            self.metrics["wall_seconds_total"] += wall_s

    def metrics_json(self) -> dict:
        with self._lock:
            m = dict(self.metrics)
        w = m["wall_seconds_total"]
        m["realtime_factor"] = round(m["audio_seconds_total"] / w, 4) if w else 0.0
        m["uptime_seconds"] = int(time.time()) - self.created
        m["state"] = self.state
        return m

    # -- lifecycle -----------------------------------------------------------
    def load(self) -> None:
        for model_id, path in self.model_map.items():
            runner = runner_from_file(path, self.default_config)
            self.runners[model_id] = runner
            if self.batch_slots > 1 and \
                    getattr(runner, "arch", "") in BATCHABLE_ARCHS:
                self.batched_workers[model_id] = BatchedModelWorker(
                    runner, n_slots=self.batch_slots)
        for i in range(self.n_parallel):
            t = threading.Thread(target=self._worker_loop, daemon=True,
                                 name=f"tts-worker-{i}")
            t.start()
            self.workers.append(t)
        self.state = "READY"

    def _worker_loop(self) -> None:
        while True:
            task = self.queue.get()
            if task is None:
                return
            try:
                runner = self.runners[task.model]
                resp = runner.generate(task.prompt, task.config)
                task.audio = resp.audio
                task.sample_rate = resp.sample_rate
                task.success = True
            except Exception as e:  # noqa: BLE001
                task.message = str(e)
                task.success = False
            task.event.set()

    def submit(self, task: ServerTask) -> ServerTask:
        t0 = time.perf_counter()
        bw = self.batched_workers.get(task.model)
        if bw is not None:
            try:
                bw.engine.validate_prompt(task.prompt, task.config)
            except ValueError:
                # prompt exceeds the batched engine's bucket (e.g. Dia's
                # cross bucket 256 vs 1024 single-stream) — route it to the
                # single-stream worker pool, which accepts larger prompts
                # or raises its own clean per-request error
                bw = None
        if bw is not None:
            bw.submit(task)
        else:
            self.queue.put(task)
        if not task.event.wait(self.timeout):
            task.success = False
            task.message = "request timed out"
        self.record(task, time.perf_counter() - t0)
        return task

    # -- model metadata ------------------------------------------------------
    def models_json(self) -> dict:
        return {"object": "list", "data": [
            {"id": mid, "object": "model", "created": self.created,
             "owned_by": "tts_tpu"} for mid in sorted(self.model_map)]}

    def voices_json(self) -> dict:
        voices = {}
        for mid, runner in self.runners.items():
            try:
                voices[mid] = [str(v) for v in runner.list_voices()]
            except Exception:
                voices[mid] = []
        return {"voices": voices}


class _Handler(BaseHTTPRequestHandler):
    server_obj: TTSServer = None  # injected

    # -- helpers -------------------------------------------------------------
    def _send(self, code: int, body: bytes, mime: str,
              extra_headers: dict | None = None) -> None:
        self.send_response(code)
        self.send_header("Content-Type", mime)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Access-Control-Allow-Origin",
                         self.headers.get("Origin", "*"))
        for k, v in (extra_headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, data: dict) -> None:
        self._send(code, json.dumps(data).encode(), MIMETYPE_JSON)

    def _error(self, message: str, code: int) -> None:
        self._send_json(code, format_error(message, code))

    def log_message(self, fmt, *args):  # quiet structured-ish log
        sys.stderr.write("request: %s\n" % (fmt % args))

    def _check_ready(self) -> bool:
        if self.server_obj.state == "LOADING":
            self._error("Loading model", 503)
            return False
        return True

    # -- routes --------------------------------------------------------------
    def do_OPTIONS(self):
        self.send_response(200)
        self.send_header("Access-Control-Allow-Credentials", "true")
        self.send_header("Access-Control-Allow-Methods", "GET, POST")
        self.send_header("Access-Control-Allow-Headers", "*")
        self.end_headers()

    def do_GET(self):
        if self.path == "/":
            self._send(200, INDEX_HTML.encode(), MIMETYPE_HTML)
            return
        if self.path == "/health":
            self._send_json(200, {"status": "ok"})
            return
        if self.path == "/metrics":
            self._send_json(200, self.server_obj.metrics_json())
            return
        if not self._check_ready():
            return
        if self.path == "/v1/models":
            self._send_json(200, self.server_obj.models_json())
            return
        if self.path == "/v1/audio/voices":
            self._send_json(200, self.server_obj.voices_json())
            return
        self._error("File Not Found", 404)

    def do_POST(self):
        if not self._check_ready():
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            data = json.loads(self.rfile.read(length) or b"{}")
        except Exception:
            self._error("invalid JSON body", 400)
            return
        if self.path == "/v1/audio/speech":
            self._handle_tts(data)
        elif self.path == "/v1/audio/conditional-prompt":
            self._handle_conditional(data)
        else:
            self._error("File Not Found", 404)

    def _handle_tts(self, data: dict) -> None:
        srv = self.server_obj
        if not isinstance(data.get("input"), str):
            self._error("the 'input' field is required for tts generation "
                        "and must be passed as a string.", 400)
            return
        prompt = data["input"]
        if not prompt:
            self._error("the 'input' field must be a non empty string", 400)
            return
        fmt = data.get("response_format", "wav")
        if fmt not in ("wav", "wave", "aiff"):
            self._error("Currently 'wav' and 'aiff' are the only supported "
                        "formats for the 'response_format' field.", 501)
            return
        import dataclasses
        conf = dataclasses.replace(srv.default_config)
        if isinstance(data.get("temperature"), (int, float)):
            conf.temperature = float(data["temperature"])
        if isinstance(data.get("top_k"), (int, float)):
            conf.top_k = int(data["top_k"])
        if isinstance(data.get("top_p"), (int, float)):
            conf.top_p = float(data["top_p"])
        if isinstance(data.get("repetition_penalty"), (int, float)):
            conf.repetition_penalty = float(data["repetition_penalty"])
        if isinstance(data.get("voice"), str):
            conf.voice = data["voice"]
        if isinstance(data.get("seed"), int):
            conf.seed = data["seed"]
        model = data.get("model", srv.default_model)
        if model not in srv.model_map:
            self._error(f"Invalid Model: {model}", 400)
            return
        if data.get("stream") is True:
            self._handle_tts_stream(prompt, conf, model)
            return
        task = srv.submit(ServerTask(prompt, conf, model))
        if not task.success:
            self._error(task.message or "generation failed", 500)
            return
        if task.audio is None or len(task.audio) == 0:
            self._error("Model returned an empty response.", 500)
            return
        # Surface the batched sampler's static top-k cap: requests routed
        # through the continuous-batching engine are truncated to the top
        # BATCHED_TOP_K_CAP tokens (ops/sampling.py) — tell the client.
        extra = None
        if (srv.batched_workers.get(model) is not None and conf.sample
                and (conf.top_k == 0 or conf.top_k > sampling.BATCHED_TOP_K_CAP)):
            extra = {"X-TTS-Top-K-Applied": str(sampling.BATCHED_TOP_K_CAP)}
        if fmt == "aiff":
            body = encode_aiff(task.audio, task.sample_rate)
            self._send(200, body, MIMETYPE_AIFF, extra)
        else:
            body = encode_wav(task.audio, task.sample_rate)
            self._send(200, body, MIMETYPE_WAV, extra)

    def _handle_tts_stream(self, prompt: str, conf, model: str) -> None:
        """Chunked-transfer streaming of raw 16-bit PCM (time-to-first-audio
        path). Models with a continuous-batching worker stream THROUGH the
        batched engine (tokens drain incrementally per decode chunk and
        vocode in segments, so streams and non-stream requests share one
        on-device program); otherwise the single-stream generator runs
        under admission control (at most n_parallel concurrent streams,
        503 otherwise). Both paths count in /metrics."""
        srv = self.server_obj
        bw = srv.batched_workers.get(model)
        if bw is not None:
            try:
                bw.engine.validate_prompt(prompt, conf)
            except ValueError:
                bw = None  # oversized for the engine: single-stream path
        if bw is not None:
            self._handle_tts_stream_batched(bw, prompt, conf, model)
            return
        runner = srv.runners[model]
        if not srv.stream_slots.acquire(timeout=min(srv.timeout, 30.0)):
            with srv._lock:
                srv.metrics["streams_rejected"] += 1
            self._error("too many concurrent streams", 503)
            return
        t0 = time.perf_counter()
        samples = 0
        ok = False
        rate = int(getattr(runner, "sample_rate", 44_100))
        try:
            if hasattr(runner, "generate_stream"):
                gen = runner.generate_stream(prompt, conf)
            else:
                resp = runner.generate(prompt, conf)
                gen = iter([resp.audio])
            self.send_response(200)
            self.send_header(
                "Content-Type",
                f"audio/pcm;rate={rate};encoding=signed-integer;bits=16")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for chunk in gen:
                pcm = (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
                if not pcm:
                    continue
                samples += len(pcm) // 2
                self.wfile.write(f"{len(pcm):X}\r\n".encode())
                self.wfile.write(pcm)
                self.wfile.write(b"\r\n")
            self.wfile.write(b"0\r\n\r\n")
            ok = True
        except BrokenPipeError:
            pass
        except Exception as e:  # noqa: BLE001
            try:
                self._error(str(e), 500)
            except Exception:
                pass
        finally:
            srv.stream_slots.release()
            with srv._lock:
                srv.metrics["streams_total"] += 1
                srv.metrics["requests_total"] += 1
                if not ok:
                    srv.metrics["requests_failed"] += 1
                srv.metrics["audio_seconds_total"] += samples / rate
                srv.metrics["wall_seconds_total"] += time.perf_counter() - t0

    def _handle_tts_stream_batched(self, bw, prompt: str, conf,
                                   model: str) -> None:
        """Stream PCM out of the continuous-batching engine: the request
        occupies a batch slot like any other; the worker thread drains its
        freshly decoded tokens each chunk and pushes vocoded segments into
        task.stream_q. No single-stream generate runs on the HTTP thread."""
        import queue as _queue
        srv = self.server_obj
        t0 = time.perf_counter()
        samples = 0
        ok = False
        task = ServerTask(prompt, conf, model,
                          stream_q=_queue.Queue(maxsize=256))
        rate = int(getattr(srv.runners[model], "sample_rate", 44_100))
        try:
            bw.submit(task)
            self.send_response(200)
            self.send_header(
                "Content-Type",
                f"audio/pcm;rate={rate};encoding=signed-integer;bits=16")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            while True:
                chunk = task.stream_q.get(timeout=srv.timeout)
                if chunk is None:
                    break
                rate = task.sample_rate or rate
                pcm = (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
                if not pcm:
                    continue
                samples += len(pcm) // 2
                self.wfile.write(f"{len(pcm):X}\r\n".encode())
                self.wfile.write(pcm)
                self.wfile.write(b"\r\n")
            self.wfile.write(b"0\r\n\r\n")
            ok = task.success or samples > 0
        except BrokenPipeError:
            pass
        except Exception as e:  # noqa: BLE001
            try:
                self._error(str(e), 500)
            except Exception:
                pass
        finally:
            with srv._lock:
                srv.metrics["streams_total"] += 1
                srv.metrics["requests_total"] += 1
                if not ok:
                    srv.metrics["requests_failed"] += 1
                srv.metrics["audio_seconds_total"] += samples / rate
                srv.metrics["wall_seconds_total"] += time.perf_counter() - t0

    def _handle_conditional(self, data: dict) -> None:
        srv = self.server_obj
        if srv.n_parallel > 1:
            self._error("conditional prompts cannot be updated with "
                        "parallelism greater than 1", 400)
            return
        if not srv.text_encoder_path:
            self._error("the server was started without a text encoder "
                        "path; conditional prompts are unsupported", 501)
            return
        prompt = data.get("conditional_prompt")
        if not isinstance(prompt, str) or not prompt:
            self._error("the 'conditional_prompt' field is required and must "
                        "be a non empty string", 400)
            return
        model = data.get("model", srv.default_model)
        if model not in srv.model_map:
            self._error(f"Invalid Model: {model}", 400)
            return
        try:
            srv.runners[model].update_conditional_prompt(
                srv.text_encoder_path, prompt)
            bw = srv.batched_workers.get(model)
            if bw is not None:
                bw.refresh_weights()
        except Exception as e:  # noqa: BLE001
            self._error(str(e), 500)
            return
        self._send_json(200, {"success": True})


def build_server(model_path: str, default_model: str = "",
                 config: Optional[GenerationConfig] = None,
                 n_parallel: int = 1, text_encoder_path: str = "",
                 timeout: float = 300.0, batch_slots: int = 0) -> TTSServer:
    model_map: Dict[str, str] = {}
    if os.path.isdir(model_path):
        for entry in sorted(os.listdir(model_path)):
            if entry.endswith(".gguf"):
                model_map[os.path.splitext(entry)[0]] = os.path.join(model_path, entry)
        if not model_map:
            raise ValueError(f"No model found in directory {model_path}")
    else:
        stem = os.path.splitext(os.path.basename(model_path))[0]
        model_map[stem] = model_path
    if default_model:
        stem = os.path.splitext(os.path.basename(default_model))[0]
        if stem not in model_map:
            raise ValueError(f"Invalid Default Model Provided: {stem}")
        default = stem
    else:
        default = sorted(model_map)[0]
    return TTSServer(model_map, default, config or GenerationConfig(),
                     n_parallel=n_parallel, text_encoder_path=text_encoder_path,
                     timeout=timeout, batch_slots=batch_slots)


def serve(server: TTSServer, host: str = "127.0.0.1", port: int = 8080):
    handler = type("BoundHandler", (_Handler,), {"server_obj": server})
    httpd = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=server.load, daemon=True)
    t.start()
    return httpd


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tts-server")
    p.add_argument("--model-path", "-mp", required=True)
    p.add_argument("--default-model", "-dm", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", "-p", type=int, default=8080)
    p.add_argument("--temperature", "-t", type=float, default=1.0)
    p.add_argument("--topk", "-tk", type=int, default=50)
    p.add_argument("--top-p", "-tp", type=float, default=1.0)
    p.add_argument("--repetition-penalty", "-r", type=float, default=1.0)
    p.add_argument("--voice", "-v", default="")
    p.add_argument("--espeak-voice-id", "-eid", default="")
    p.add_argument("--no-cross-attn", "-ca", action="store_true")
    p.add_argument("--text-encoder-path", "-tep", default="")
    p.add_argument("--n-parallelism", "-np", type=int, default=1)
    p.add_argument("--batch-slots", "-bs", type=int, default=0,
                   help="continuous-batching slots for Parler models "
                        "(0 = off); requests decode together on-device")
    p.add_argument("--timeout", type=int, default=300)
    # accepted for reference compatibility; no-ops on TPU
    p.add_argument("--n-threads", "-nt", type=int, default=0)
    p.add_argument("--n-http-threads", "-ht", type=int, default=0)
    p.add_argument("--use-metal", "-m", action="store_true")
    p.add_argument("--ssl-file-cert", "-sfc", default="")
    p.add_argument("--ssl-file-key", "-sfk", default="")
    args = p.parse_args(argv)
    if not (0.0 < args.top_p <= 1.0):
        print("The '--top-p' value must be between 0.0 and 1.0.", file=sys.stderr)
        return 1
    config = GenerationConfig(
        voice=args.voice, top_k=args.topk, temperature=args.temperature,
        repetition_penalty=args.repetition_penalty,
        use_cross_attn=not args.no_cross_attn,
        espeak_voice_id=args.espeak_voice_id, top_p=args.top_p)
    server = build_server(args.model_path, args.default_model, config,
                          n_parallel=args.n_parallelism,
                          text_encoder_path=args.text_encoder_path,
                          timeout=args.timeout, batch_slots=args.batch_slots)
    httpd = serve(server, args.host, args.port)
    if args.ssl_file_cert and args.ssl_file_key:
        import ssl
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(args.ssl_file_cert, args.ssl_file_key)
        httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
        print(f"Running with SSL: key = {args.ssl_file_key}, "
              f"cert = {args.ssl_file_cert}")
    print(f"tts-server listening on {args.host}:{args.port}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
