"""Server integration tests over real HTTP with the dummy + tiny parler
models (reference exercises the stack the same way via test:dummy)."""
import json
import threading
import time
import urllib.request
import urllib.error

import numpy as np
import pytest

from tts_tpu.audio.wav import decode_wav
from tts_tpu.common import GenerationConfig
from tts_tpu.server.server import TTSServer, build_server, serve


@pytest.fixture(scope="module")
def dummy_server():
    srv = TTSServer({"dummy": "test:dummy"}, "dummy", GenerationConfig(),
                    n_parallel=2, timeout=60)
    httpd = serve(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    for _ in range(100):
        if srv.state == "READY":
            break
        time.sleep(0.05)
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read(), r.headers.get("Content-Type", "")


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read(), r.headers.get("Content-Type", "")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type", "")


def test_health(dummy_server):
    code, body, _ = _get(dummy_server + "/health")
    assert code == 200
    assert json.loads(body)["status"] == "ok"


def test_index(dummy_server):
    code, body, mime = _get(dummy_server + "/")
    assert code == 200 and b"tts" in body and "html" in mime


def test_models(dummy_server):
    code, body, _ = _get(dummy_server + "/v1/models")
    data = json.loads(body)
    assert code == 200
    assert data["object"] == "list"
    assert data["data"][0]["id"] == "dummy"


def test_voices(dummy_server):
    code, body, _ = _get(dummy_server + "/v1/audio/voices")
    assert code == 200
    assert "voices" in json.loads(body)


def test_speech_wav(dummy_server):
    code, body, mime = _post(dummy_server + "/v1/audio/speech",
                             {"input": "ab"})
    assert code == 200 and mime == "audio/wav"
    audio, rate = decode_wav(body)
    assert rate == 44100
    assert len(audio) == 2 * 44100


def test_speech_aiff(dummy_server):
    code, body, mime = _post(dummy_server + "/v1/audio/speech",
                             {"input": "a", "response_format": "aiff"})
    assert code == 200 and mime == "audio/aiff"
    assert body[:4] == b"FORM"


def test_speech_missing_input(dummy_server):
    code, body, _ = _post(dummy_server + "/v1/audio/speech", {})
    assert code == 400
    assert json.loads(body)["error"]["type"] == "invalid_request_error"


def test_speech_bad_format(dummy_server):
    code, body, _ = _post(dummy_server + "/v1/audio/speech",
                          {"input": "x", "response_format": "mp3"})
    assert code == 501


def test_speech_bad_model(dummy_server):
    code, body, _ = _post(dummy_server + "/v1/audio/speech",
                          {"input": "x", "model": "nope"})
    assert code == 400


def test_404(dummy_server):
    try:
        code, body, _ = _get(dummy_server + "/nope")
    except urllib.error.HTTPError as e:
        code, body = e.code, e.read()
    assert code == 404
    assert json.loads(body)["error"]["type"] == "not_found_error"


def test_stream_sample_rate_header():
    """PCM streaming must advertise the MODEL's sample rate, not 44.1 kHz —
    a 24 kHz model (Kokoro/Orpheus) streamed as rate=44100 plays 1.84x fast."""
    srv = TTSServer({"dummy": "test:dummy"}, "dummy", GenerationConfig(),
                    n_parallel=1, timeout=60)
    httpd = serve(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        for _ in range(100):
            if srv.state == "READY":
                break
            time.sleep(0.05)
        srv.runners["dummy"].sample_rate = 24_000  # emulate a Kokoro-rate model
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/audio/speech",
            data=json.dumps({"input": "ab", "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            mime = r.headers.get("Content-Type", "")
            body = r.read()
        assert "rate=24000" in mime, mime
        # chunked PCM actually decodes to the dummy's 2s of 16-bit audio
        assert len(body) == 2 * 44_100 * 2  # dummy emits 1 s per char @44.1k
    finally:
        httpd.shutdown()


def test_concurrent_requests(dummy_server):
    results = []

    def hit():
        code, body, _ = _post(dummy_server + "/v1/audio/speech", {"input": "a"})
        results.append(code)

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 4


def test_parler_model_server(tmp_path, rng):
    from tests.test_e2e_parler import make_tiny_parler_gguf
    path = tmp_path / "tiny.gguf"
    make_tiny_parler_gguf(str(path), rng)
    srv = build_server(str(tmp_path), config=GenerationConfig(sample=False))
    httpd = serve(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(600):
        if srv.state == "READY":
            break
        time.sleep(0.1)
    assert srv.state == "READY"
    code, body, _ = _get(base + "/v1/models")
    assert json.loads(body)["data"][0]["id"] == "tiny"
    code, body, mime = _post(base + "/v1/audio/speech",
                             {"input": "hello world", "seed": 0})
    assert code in (200, 500)  # tiny random model may emit zero valid frames
    if code == 200:
        assert mime == "audio/wav"
    httpd.shutdown()


def test_parler_batched_server_matches_unbatched(tmp_path, rng):
    """Concurrent requests through --batch-slots must return byte-identical
    audio to the single-stream server (greedy decode)."""
    from tests.test_e2e_parler import make_tiny_parler_gguf
    path = tmp_path / "tiny.gguf"
    make_tiny_parler_gguf(str(path), rng)

    def boot(batch_slots):
        srv = build_server(str(tmp_path), config=GenerationConfig(sample=False),
                           batch_slots=batch_slots)
        httpd = serve(srv, "127.0.0.1", 0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        for _ in range(600):
            if srv.state == "READY":
                break
            time.sleep(0.1)
        assert srv.state == "READY"
        return srv, httpd, f"http://127.0.0.1:{httpd.server_address[1]}"

    srv1, httpd1, base1 = boot(0)
    ref = {}
    for text in ("hello world", "wor ld a b"):
        ref[text] = _post(base1 + "/v1/audio/speech", {"input": text})
    httpd1.shutdown()

    srv2, httpd2, base2 = boot(2)
    assert "tiny" in srv2.batched_workers
    results = {}
    lock = threading.Lock()

    def req(text):
        r = _post(base2 + "/v1/audio/speech", {"input": text})
        with lock:
            results[text] = r
    threads = [threading.Thread(target=req, args=(t,))
               for t in ("hello world", "wor ld a b", "hello world")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    httpd2.shutdown()
    for text, (code, body, mime) in results.items():
        rcode, rbody, _ = ref[text]
        assert code == rcode, (text, code, body[:200])
        if code == 200:
            assert body == rbody


def test_metrics_endpoint(dummy_server):
    code, body, _ = _post(dummy_server + "/v1/audio/speech",
                          {"input": "hi", "model": "dummy"})
    assert code == 200
    code, body, _ = _get(dummy_server + "/metrics")
    assert code == 200
    m = json.loads(body)
    assert m["requests_total"] >= 1
    assert m["audio_seconds_total"] > 0
    assert m["state"] == "READY"
    assert "realtime_factor" in m and "uptime_seconds" in m


def test_orpheus_batched_server_matches_unbatched(tmp_path, rng):
    """4 concurrent Orpheus requests through --batch-slots decode in ONE
    batched engine and return byte-identical audio to the single-stream
    server (greedy decode, fixed SNAC noise seed)."""
    from tests.test_e2e_dia_orpheus import serialize_orpheus
    from tests.test_orpheus import make_orpheus, make_tiny_snac
    cfg, w = make_orpheus(rng)
    snac_cfg, snac_w = make_tiny_snac(rng)
    serialize_orpheus(str(tmp_path / "orph.gguf"), cfg, w, snac_cfg, snac_w)

    def boot(batch_slots):
        srv = build_server(str(tmp_path), config=GenerationConfig(sample=False),
                           batch_slots=batch_slots)
        httpd = serve(srv, "127.0.0.1", 0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        for _ in range(600):
            if srv.state == "READY":
                break
            time.sleep(0.1)
        assert srv.state == "READY"
        return srv, httpd, f"http://127.0.0.1:{httpd.server_address[1]}"

    texts = ("hi", "hi there", "hi hi", "hi")
    srv1, httpd1, base1 = boot(0)
    ref = {t: _post(base1 + "/v1/audio/speech", {"input": t, "seed": 0})
           for t in set(texts)}
    httpd1.shutdown()

    srv2, httpd2, base2 = boot(4)
    assert "orph" in srv2.batched_workers
    assert srv2.batched_workers["orph"].arch == "orpheus"
    results = {}
    lock = threading.Lock()

    def req(i, text):
        r = _post(base2 + "/v1/audio/speech", {"input": text, "seed": 0})
        with lock:
            results[i] = (text, r)

    threads = [threading.Thread(target=req, args=(i, t))
               for i, t in enumerate(texts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    httpd2.shutdown()
    assert len(results) == 4
    for i, (text, (code, body, mime)) in results.items():
        rcode, rbody, _ = ref[text]
        assert code == rcode, (text, code, body[:200])
        if code == 200:
            assert body == rbody, f"batched audio differs for {text!r}"


def test_stream_admission_and_metrics():
    """stream:true requests are admission-controlled (n_parallel concurrent)
    and counted in /metrics."""
    srv = TTSServer({"dummy": "test:dummy"}, "dummy", GenerationConfig(),
                    n_parallel=2, timeout=60)
    httpd = serve(srv, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        for _ in range(100):
            if srv.state == "READY":
                break
            time.sleep(0.05)
        base = f"http://127.0.0.1:{port}"

        codes = []
        lock = threading.Lock()

        def stream(text):
            req = urllib.request.Request(
                base + "/v1/audio/speech",
                data=json.dumps({"input": text, "stream": True}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    r.read()
                    c = r.status
            except urllib.error.HTTPError as e:
                c = e.code
            with lock:
                codes.append(c)

        threads = [threading.Thread(target=stream, args=("abc",))
                   for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert codes.count(200) == 3          # queueing, not rejection
        # the client can see the terminating chunk before the server-side
        # finally block records the stream — poll briefly
        for _ in range(50):
            _, body, _ = _get(base + "/metrics")
            m = json.loads(body)
            if m["streams_total"] >= 3:
                break
            time.sleep(0.05)
        assert m["streams_total"] >= 3
        assert m["requests_total"] >= 3
        assert m["audio_seconds_total"] > 0
    finally:
        httpd.shutdown()


def test_streams_ride_the_batched_engine(tmp_path, rng):
    """Round-5 task: streaming composes with continuous batching — 2
    stream:true + 2 non-stream requests run concurrently through ONE
    --batch-slots 4 engine; streamed PCM matches the non-stream audio;
    streams count in /metrics; NO single-stream generate runs on the HTTP
    thread (runner.generate/generate_stream are booby-trapped)."""
    from tests.test_e2e_parler import make_tiny_parler_gguf
    path = tmp_path / "tiny.gguf"
    make_tiny_parler_gguf(str(path), rng)
    srv = build_server(str(tmp_path), config=GenerationConfig(sample=False),
                       batch_slots=4)
    httpd = serve(srv, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    for _ in range(600):
        if srv.state == "READY":
            break
        time.sleep(0.1)
    assert srv.state == "READY" and "tiny" in srv.batched_workers

    def _booby(*a, **k):
        raise AssertionError("single-stream generate ran on the HTTP path")
    runner = srv.runners["tiny"]
    runner.generate = _booby
    runner.generate_stream = _booby

    results = {}
    lock = threading.Lock()

    def req_plain(kk):
        r = _post(base + "/v1/audio/speech", {"input": "hello world"})
        with lock:
            results[kk] = r

    def req_stream(kk):
        req = urllib.request.Request(
            base + "/v1/audio/speech",
            data=json.dumps({"input": "hello world",
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            body = r.read()
            with lock:
                results[kk] = (r.status, body,
                               r.headers.get("Content-Type", ""))

    threads = [threading.Thread(target=req_stream, args=("s1",)),
               threading.Thread(target=req_plain, args=("p1",)),
               threading.Thread(target=req_stream, args=("s2",)),
               threading.Thread(target=req_plain, args=("p2",))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    httpd.shutdown()

    assert results["p1"][0] in (200, 500)
    assert results["p1"] == results["p2"]
    s1, s2 = results["s1"], results["s2"]
    assert s1[0] == 200 and "audio/pcm" in s1[2]
    assert s1[1] == s2[1]
    if results["p1"][0] == 200:
        # streamed PCM must match the batched non-stream audio (same
        # greedy decode; the margin logic makes mid-chunks exact)
        _, wav_body, _ = results["p1"]
        audio, rate = decode_wav(wav_body)
        want = (np.clip(audio, -1, 1) * 32767).astype("<i2")
        got = np.frombuffer(s1[1], "<i2")
        assert got.shape[0] == want.shape[0], (got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2)
    mj = srv.metrics_json()
    assert mj["streams_total"] >= 2
    assert mj["requests_total"] >= 4
