"""Serving layer: dynamic micro-batching + HTTP front (zerovox_tpu/serving/).

Unit tests drive the batcher with a fake engine (grouping, ordering,
error propagation); integration tests run the real HTTP server over a
small random-weight engine and hit it with concurrent clients, checking
that responses are valid WAV files, rows match direct `tts_batch` calls,
and concurrent requests actually coalesce into one batch.
"""

import json
import threading
import time
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

from zerovox_tpu.serving import (STREAM_EOS, DynamicBatcher, VoiceRegistry,
                                 make_server)
from zerovox_tpu.serving.server import (_pcm16_bytes, _wav_bytes,
                                        _wav_stream_header, serve_in_thread)


class FakeEngine:
    """Records tts_batch call sizes; returns per-row deterministic wavs."""

    def __init__(self, delay_s: float = 0.0, fail: bool = False):
        self.calls: list[int] = []
        self.delay_s = delay_s
        self.fail = fail

    def tts_batch(self, texts, spkembs):
        assert spkembs.shape[0] == len(texts)
        if self.delay_s:
            time.sleep(self.delay_s)
        if self.fail:
            raise RuntimeError("boom")
        self.calls.append(len(texts))
        return [(np.full(8, float(len(t)), np.float32), len(t))
                for t in texts]

    def tts_stream_text(self, text, spkemb, chunk_frames=96):
        # one chunk per word, value = word length (deterministic)
        for w in text.split():
            if w == "FAIL":
                raise RuntimeError("stream boom")
            yield np.full(4, float(len(w)), np.float32)


EMB = np.zeros((1, 1, 4), np.float32)


class TestDynamicBatcher:
    def test_single_request_resolves(self):
        b = DynamicBatcher(FakeEngine(), max_batch=4, max_delay_ms=5)
        try:
            wav, mel_len = b.submit("abc", EMB).result(timeout=5)
            assert mel_len == 3 and wav[0] == 3.0
            assert b.stats.requests == 1 and b.stats.batches == 1
        finally:
            b.close()

    def test_concurrent_requests_coalesce(self):
        # engine is busy with a first dispatch while more requests queue up;
        # the next window must group them (the whole point of the batcher)
        eng = FakeEngine(delay_s=0.15)
        b = DynamicBatcher(eng, max_batch=8, max_delay_ms=30)
        try:
            futs = [b.submit("x" * (i + 1), EMB) for i in range(5)]
            outs = [f.result(timeout=10) for f in futs]
            # order-preserving mapping: row i belongs to request i
            assert [m for _, m in outs] == [1, 2, 3, 4, 5]
            assert b.stats.batches < 5  # strictly fewer dispatches than reqs
            assert b.stats.max_batch_seen >= 2
        finally:
            b.close()

    def test_max_batch_bounds_window(self):
        eng = FakeEngine(delay_s=0.1)
        b = DynamicBatcher(eng, max_batch=2, max_delay_ms=200)
        try:
            futs = [b.submit("yy", EMB) for _ in range(5)]
            for f in futs:
                f.result(timeout=10)
            assert max(eng.calls) <= 2
        finally:
            b.close()

    def test_engine_error_propagates_to_all(self):
        b = DynamicBatcher(FakeEngine(fail=True), max_batch=4, max_delay_ms=5)
        try:
            futs = [b.submit("z", EMB) for _ in range(3)]
            for f in futs:
                with pytest.raises(RuntimeError, match="boom"):
                    f.result(timeout=5)
            assert b.stats.errors == 3
        finally:
            b.close()

    def test_idle_backoff_shrinks_window(self):
        # sparse traffic: after each single-request window the coalescing
        # delay halves (floored), so lone requests stop paying max_delay
        b = DynamicBatcher(FakeEngine(), max_batch=4, max_delay_ms=40)
        try:
            assert b._cur_delay_s == pytest.approx(0.040)
            for _ in range(3):
                b.submit("a", EMB).result(timeout=5)
            assert b._cur_delay_s <= 0.040 / 8 + 1e-9
            for _ in range(10):  # floor, never zero
                b.submit("a", EMB).result(timeout=5)
            assert b._cur_delay_s == pytest.approx(DynamicBatcher.MIN_DELAY_S)
            # a shrunken window still resolves promptly end-to-end
            t0 = time.monotonic()
            b.submit("abc", EMB).result(timeout=5)
            assert time.monotonic() - t0 < 0.040
        finally:
            b.close()

    def test_backoff_resets_on_coalesced_window(self):
        # burst traffic restores the full window: once a window actually
        # groups >=2 requests the delay snaps back to max_delay_ms
        eng = FakeEngine(delay_s=0.1)
        b = DynamicBatcher(eng, max_batch=8, max_delay_ms=40)
        try:
            for _ in range(6):  # shrink to the floor first
                b.submit("a", EMB).result(timeout=5)
            assert b._cur_delay_s == pytest.approx(DynamicBatcher.MIN_DELAY_S)
            # while the engine sleeps on the first dispatch, queue a burst:
            # the next window finds them already waiting and coalesces
            futs = [b.submit("x" * (i + 1), EMB) for i in range(5)]
            for f in futs:
                f.result(timeout=10)
            assert b.stats.max_batch_seen >= 2
            assert b._cur_delay_s == pytest.approx(0.040)
        finally:
            b.close()

    def test_close_rejects_new_submits(self):
        b = DynamicBatcher(FakeEngine(), max_batch=2, max_delay_ms=5)
        b.close()
        with pytest.raises(RuntimeError):
            b.submit("a", EMB)
        with pytest.raises(RuntimeError):
            b.submit_stream("a", EMB)


class TestStreamDispatch:
    def test_stream_chunks_then_eos(self):
        b = DynamicBatcher(FakeEngine(), max_batch=4, max_delay_ms=5)
        try:
            q = b.submit_stream("one four ab", EMB)
            vals = []
            while True:
                item = q.get(timeout=5)
                if item is STREAM_EOS:
                    break
                vals.append(item[0])
            assert vals == [3.0, 4.0, 2.0]
            assert b.stats.streams == 1 and b.stats.stream_chunks == 3
        finally:
            b.close()

    def test_first_chunk_before_synthesis_finishes(self):
        # the defining property of streaming: chunk 1 is consumable while
        # the engine is still producing. The generator blocks on an event
        # that only the CONSUMER sets after receiving chunk 1 — if chunks
        # were delivered only at end-of-stream this would deadlock (hence
        # the timeouts).
        release = threading.Event()

        class Eng(FakeEngine):
            def tts_stream_text(self, text, spkemb, chunk_frames=96):
                yield np.full(4, 1.0, np.float32)
                assert release.wait(10), "consumer never saw chunk 1"
                yield np.full(4, 2.0, np.float32)

        b = DynamicBatcher(Eng(), max_batch=4, max_delay_ms=5)
        try:
            q = b.submit_stream("x", EMB)
            first = q.get(timeout=5)
            assert first[0] == 1.0
            release.set()
            assert q.get(timeout=5)[0] == 2.0
            assert q.get(timeout=5) is STREAM_EOS
        finally:
            b.close()

    def test_stream_error_propagates_after_partial(self):
        b = DynamicBatcher(FakeEngine(), max_batch=4, max_delay_ms=5)
        try:
            q = b.submit_stream("ok FAIL never", EMB)
            assert q.get(timeout=5)[0] == 2.0  # 'ok' chunk made it out
            err = q.get(timeout=5)
            assert isinstance(err, RuntimeError) and "stream boom" in str(err)
            assert b.stats.errors == 1
        finally:
            b.close()

    def test_batch_completes_while_stream_active(self):
        # no head-of-line blocking: a batch request submitted mid-stream
        # must resolve while the stream is still producing. The stream only
        # ENDS when the test says so — if the scheduler ran streams to
        # completion before batches, f.result() below would deadlock.
        stream_may_end = threading.Event()

        class Eng(FakeEngine):
            def tts_stream_text(self, text, spkemb, chunk_frames=96):
                while not stream_may_end.is_set():
                    yield np.zeros(4, np.float32)
                    time.sleep(0.005)

        b = DynamicBatcher(Eng(), max_batch=4, max_delay_ms=5)
        try:
            q = b.submit_stream("endless", EMB)
            assert q.get(timeout=5) is not STREAM_EOS  # stream is running
            f = b.submit("abcde", EMB)
            wav, mel_len = f.result(timeout=10)  # interleaved, not starved
            assert mel_len == 5
            stream_may_end.set()
            while q.get(timeout=10) is not STREAM_EOS:
                pass
            assert b.stats.streams == 1 and b.stats.requests == 1
        finally:
            stream_may_end.set()
            b.close()

    def test_two_streams_round_robin(self):
        b = DynamicBatcher(FakeEngine(), max_batch=4, max_delay_ms=5)
        try:
            qa = b.submit_stream("aa bb cc", EMB)
            qb = b.submit_stream("x y z", EMB)
            for q, want in ((qa, [2.0, 2.0, 2.0]), (qb, [1.0, 1.0, 1.0])):
                got = []
                while True:
                    item = q.get(timeout=5)
                    if item is STREAM_EOS:
                        break
                    got.append(item[0])
                assert got == want
            assert b.stats.streams == 2 and b.stats.stream_chunks == 6
        finally:
            b.close()

    def test_streams_serialize_with_batches(self):
        # batch requests queued behind a stream (and vice versa) all
        # complete; a stream pulled mid-window becomes the holdover item
        eng = FakeEngine(delay_s=0.05)
        b = DynamicBatcher(eng, max_batch=8, max_delay_ms=50)
        try:
            futs = [b.submit("yy", EMB) for _ in range(3)]
            q = b.submit_stream("a bb", EMB)
            futs += [b.submit("zzz", EMB) for _ in range(2)]
            for f in futs:
                f.result(timeout=10)
            got = []
            while True:
                item = q.get(timeout=10)
                if item is STREAM_EOS:
                    break
                got.append(item[0])
            assert got == [1.0, 2.0]
            assert b.stats.requests == 5 and b.stats.streams == 1
        finally:
            b.close()


class TestWavFraming:
    def test_roundtrip(self, tmp_path):
        import io

        wav = np.sin(np.linspace(0, 30, 1000)).astype(np.float32) * 0.5
        data = _wav_bytes(wav, 22050)
        with wave.open(io.BytesIO(data)) as w:
            assert w.getframerate() == 22050
            assert w.getnchannels() == 1
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        np.testing.assert_allclose(pcm / 32767.0, wav, atol=1.0 / 32767)


class TestVoiceRegistry:
    def test_default_and_named(self):
        reg = VoiceRegistry()
        with pytest.raises(KeyError):
            reg.get(None)
        reg.add("b", np.ones((1, 1, 4), np.float32))
        reg.add("a", 2 * np.ones((1, 1, 4), np.float32))
        assert reg.names() == ["a", "b"]
        assert reg.get(None)[0, 0, 0] == 2.0  # first by sorted name
        assert reg.get("b")[0, 0, 0] == 1.0
        with pytest.raises(KeyError):
            reg.get("missing")


# ---------------------------------------------------------------------------
# Integration: real engine + real HTTP server
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def synth():
    from test_synthesize import SMALL_MELDEC, small_cfg

    from zerovox_tpu.synthesize import ZeroVoxTTS

    return ZeroVoxTTS.from_random(small_cfg(), SMALL_MELDEC, seed=0)


@pytest.fixture(scope="module")
def server(synth):
    rng = np.random.default_rng(1)
    voices = VoiceRegistry()
    for name in ("alice", "bob"):
        voices.add_from_wav(name, synth,
                            rng.normal(size=12000).astype(np.float32) * 0.2)
    srv = make_server(synth, voices, port=0, max_batch=4, max_delay_ms=40)
    serve_in_thread(srv)
    yield srv
    srv.shutdown_serving()


def _url(srv, path):
    host, port = srv.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post_tts(srv, payload, timeout=120):
    req = urllib.request.Request(
        _url(srv, "/tts"), data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


class TestHTTPServer:
    def test_health_and_voices(self, server):
        with urllib.request.urlopen(_url(server, "/health"), timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["voices"] == ["alice", "bob"]
        assert h["sampling_rate"] == 22050
        with urllib.request.urlopen(_url(server, "/voices"), timeout=30) as r:
            assert json.loads(r.read()) == ["alice", "bob"]

    def test_tts_returns_valid_wav(self, server, synth):
        import io

        with _post_tts(server, {"text": "Hello world.", "voice": "alice"}) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            mel_frames = int(r.headers["X-Mel-Frames"])
            data = r.read()
        with wave.open(io.BytesIO(data)) as w:
            assert w.getframerate() == synth.cfg.audio.sampling_rate
            n = w.getnframes()
        assert mel_frames >= 1
        assert n == mel_frames * synth.cfg.audio.hop_size

    def test_concurrent_requests_batch_and_match_direct(self, server, synth):
        texts = ["One.", "Two two.", "Three three three.", "Four."]
        results = [None] * len(texts)

        def hit(i):
            with _post_tts(server, {"text": texts[i], "voice": "bob"}) as r:
                results[i] = (r.read(), int(r.headers["X-Mel-Frames"]))

        before = server.batcher.stats.batches
        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None for r in results)

        # rows must equal a direct tts_batch with the same voice
        embs = np.concatenate([server.voices.get("bob")] * len(texts))
        direct = synth.tts_batch(texts, embs)
        import io

        for (body, mel_frames), (wav, mel_len) in zip(results, direct):
            assert mel_frames == mel_len
            with wave.open(io.BytesIO(body)) as w:
                pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
            # frame the direct row through the same helper — the engine may
            # already return int16 wire samples (ZEROVOX_WIRE_DTYPE=auto)
            ref_body = _wav_bytes(np.asarray(wav),
                                  synth.cfg.audio.sampling_rate)
            with wave.open(io.BytesIO(ref_body)) as w:
                ref = np.frombuffer(w.readframes(w.getnframes()), np.int16)
            np.testing.assert_array_equal(pcm, ref)

        # at least one window grouped >1 request
        assert server.batcher.stats.max_batch_seen >= 2
        assert server.batcher.stats.batches - before < len(texts)

    def test_stream_tts_chunked_wav(self, server, synth):
        import http.client

        text = "First sentence here. Second sentence follows. A third one."
        host, port = server.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=300)
        try:
            conn.request("POST", "/tts", json.dumps(
                {"text": text, "voice": "alice", "stream": True,
                 "chunk_frames": 32}),
                headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.getheader("Content-Type") == "audio/wav"
            assert resp.getheader("Transfer-Encoding") == "chunked"
            assert resp.getheader("X-Stream-Chunk-Frames") == "32"
            body = resp.read()
        finally:
            conn.close()

        header = _wav_stream_header(synth.cfg.audio.sampling_rate)
        assert body[: len(header)] == header
        assert body[:4] == b"RIFF" and body[4:8] == b"\xff\xff\xff\xff"
        pcm = body[len(header):]

        # byte-exact vs the direct streaming API with the same voice/params
        direct = b"".join(
            _pcm16_bytes(c) for c in synth.tts_stream_text(
                text, server.voices.get("alice"), chunk_frames=32))
        assert pcm == direct
        assert len(pcm) > 0 and len(pcm) % 2 == 0
        assert server.batcher.stats.streams >= 1
        assert server.batcher.stats.stream_chunks >= 2

    def test_unknown_voice_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_tts(server, {"text": "hi", "voice": "nobody"})
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert body["voices"] == ["alice", "bob"]

    def test_bad_json_400(self, server):
        req = urllib.request.Request(_url(server, "/tts"), data=b"not json")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    def test_unknown_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(_url(server, "/nope"), timeout=30)
        assert ei.value.code == 404
