"""Batched serving CLI: prompts file -> PNGs + manifest; padded final
batch; tp sharding path on the virtual mesh."""

import json

import jax
import jax.numpy as jnp
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
from f_lite_tpu.pipeline import FLitePipeline
from f_lite_tpu.text.encoder import ZeroTextEncoder

# compile-heavy (virtual-mesh XLA compiles / live servers): run in the
# full tier only; `pytest -m "not slow"` is the fast development tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    cfg = DiTConfig(
        in_channels=4, patch_size=2, hidden_size=64, depth=2, num_heads=4,
        mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
    )
    dit = DiT(cfg)
    params = dit.init_params(jax.random.key(0), text_len=8, image_size=8)
    vae = AutoencoderKL(VAEConfig.tiny())
    vparams = vae.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
    pipe = FLitePipeline(dit, params, vae, vparams,
                         ZeroTextEncoder(32, 8))
    pipe.save_pretrained(d)
    return d


class TestServe:
    def test_batch_serving(self, model_dir, tmp_path):
        from f_lite_tpu.serve import main

        pf = tmp_path / "prompts.txt"
        pf.write_text("a cat\na dog\na bird\na fish\na horse\n")
        out = tmp_path / "outs"
        manifest = main([
            "--model", str(model_dir),
            "--prompts", str(pf),
            "--batch_size", "2",
            "--width", "16", "--height", "16",
            "--steps", "1",
            "--negative_prompt", "blurry",
            "--no_text_encoder",
            "--output_dir", str(out),
        ])
        assert len(manifest["images"]) == 5  # padded batch trimmed
        assert (out / "00004.png").exists()
        m = json.loads((out / "manifest.json").read_text())
        assert m["images_per_min"] > 0
        # every PNG carries its generation parameters
        from f_lite_tpu.utils.image import read_metadata

        meta = read_metadata(out / "00002.png")
        assert meta["prompt"] == "a bird" and meta["steps"] == 1
        assert meta["negative_prompt"] == "blurry"

    def test_tp_serving(self, model_dir, tmp_path):
        from f_lite_tpu.serve import main

        pf = tmp_path / "p.txt"
        pf.write_text("x\ny\n")
        out = tmp_path / "o2"
        manifest = main([
            "--model", str(model_dir),
            "--prompts", str(pf),
            "--batch_size", "2",
            "--width", "16", "--height", "16",
            "--steps", "1",
            "--tp", "4",
            "--no_text_encoder",
            "--output_dir", str(out),
        ])
        assert len(manifest["images"]) == 2

    def test_dp_serving_matches_single_device(self, model_dir, tmp_path):
        """--dp shards the batch across chips; same seeds, same batching
        -> the images must match the unsharded run (throughput axis must
        not change results)."""
        import numpy as np
        from PIL import Image

        from f_lite_tpu.parallel.mesh import clear_mesh_rules
        from f_lite_tpu.serve import main

        pf = tmp_path / "p.txt"
        pf.write_text("a\nb\nc\nd\n")
        outs = {}
        for name, extra in (
            ("base", []),
            ("dp", ["--dp", "2"]),
            ("dp_tp", ["--dp", "2", "--tp", "2"]),
        ):
            out = tmp_path / name
            clear_mesh_rules()  # no sticky mesh from a previous run
            main([
                "--model", str(model_dir),
                "--prompts", str(pf),
                "--batch_size", "2",
                "--width", "16", "--height", "16",
                "--steps", "2",
                "--no_text_encoder",
                "--output_dir", str(out),
            ] + extra)
            outs[name] = [
                np.asarray(Image.open(out / f"{i:05d}.png"), np.float32)
                for i in range(4)
            ]
        clear_mesh_rules()
        for name in ("dp", "dp_tp"):
            for i in range(4):
                # dp only re-partitions batch rows (bitwise-grade); tp
                # splits contractions (reduction order changes at fp32)
                assert np.max(np.abs(outs[name][i] - outs["base"][i])) \
                    <= 2.0, (name, i)

    def test_dp_validation(self, model_dir, tmp_path):
        from f_lite_tpu.serve import main

        pf = tmp_path / "p.txt"
        pf.write_text("x\n")
        with pytest.raises(SystemExit, match="divisible by"):
            main(["--model", str(model_dir), "--prompts", str(pf),
                  "--batch_size", "3", "--dp", "2"])
        with pytest.raises(SystemExit, match="devices"):
            main(["--model", str(model_dir), "--prompts", str(pf),
                  "--batch_size", "16", "--dp", "16", "--width", "16",
                  "--height", "16", "--no_text_encoder"])

    def test_jsonl_rows_reproduce_solo(self, model_dir, tmp_path):
        """.jsonl batch mode: per-row negatives/seeds with per-row
        latents — a row's image must not depend on how it was batched,
        and its metadata must reproduce it alone."""
        import numpy as np
        from PIL import Image

        from f_lite_tpu.serve import main
        from f_lite_tpu.utils.image import read_metadata

        jf = tmp_path / "p.jsonl"
        jf.write_text("\n".join([
            '{"prompt": "a cat", "seed": 7}',
            '{"prompt": "a dog", "negative_prompt": "blurry"}',
            '{"prompt": "a bird", "seed": 42}',
        ]) + "\n")
        base = ["--model", str(model_dir), "--prompts", str(jf),
                "--width", "16", "--height", "16", "--steps", "2",
                "--seed", "100", "--no_text_encoder"]
        m2 = main(base + ["--batch_size", "2",
                          "--output_dir", str(tmp_path / "b2")])
        m1 = main(base + ["--batch_size", "1",
                          "--output_dir", str(tmp_path / "b1")])
        assert [r["seed"] for r in m2["images"]] == [7, 101, 42]
        assert [r["seed"] for r in m1["images"]] == [7, 101, 42]
        for i in range(3):
            a = np.asarray(Image.open(tmp_path / "b2" / f"{i:05d}.png"),
                           np.float32)
            b = np.asarray(Image.open(tmp_path / "b1" / f"{i:05d}.png"),
                           np.float32)
            assert np.max(np.abs(a - b)) <= 2.0, i
        meta = read_metadata(tmp_path / "b2" / "00001.png")
        assert meta["negative_prompt"] == "blurry"
        assert meta["seed"] == 101
        assert "batch_size" not in meta  # rows reproduce alone
        # and reproduce via the PIPELINE's own solo draw (the actual
        # --from_png path), not just another serve batching — guards
        # _row_latents against diverging from the internal seed draw
        from f_lite_tpu.pipeline import FLitePipeline
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        pipe = FLitePipeline.from_pretrained(
            model_dir, text_encoder=ZeroTextEncoder(32)
        )
        solo = pipe(prompt="a cat", height=16, width=16,
                    num_inference_steps=2, guidance_scale=6.0, seed=7,
                    pad_context_to=128)
        sa = np.asarray(solo.images[0], np.float32)
        b0 = np.asarray(Image.open(tmp_path / "b1" / "00000.png"),
                        np.float32)
        assert np.max(np.abs(sa - b0)) <= 2.0

    @pytest.mark.parametrize("line,frag", [
        ('{"prompt": ""}', "non-empty"),
        ('{"prompt": "x", "width": 32}', "unknown keys"),
        ('{"prompt": "x", "seed": "five"}', "seed must be"),
        ("not json", "invalid JSON"),
    ])
    def test_jsonl_validation(self, model_dir, tmp_path, line, frag):
        from f_lite_tpu.serve import main

        jf = tmp_path / "p.jsonl"
        jf.write_text(line + "\n")
        with pytest.raises(SystemExit, match=frag):
            main(["--model", str(model_dir), "--prompts", str(jf),
                  "--width", "16", "--height", "16"])

    def test_precomputed_preflight_fails_fast(self, model_dir, tmp_path):
        """A caption missing from the precompute cache (negative prompt
        included) must error BEFORE the model load."""
        import numpy as np

        from f_lite_tpu.serve import main
        from f_lite_tpu.text.encoder import caption_cache_key

        cache = tmp_path / "cache"
        (cache / "text_embeddings").mkdir(parents=True)
        np.save(
            cache / "text_embeddings"
            / f"embedding_{caption_cache_key('a cat')}.npy",
            np.zeros((4, 32), np.float32),
        )
        pf = tmp_path / "p.txt"
        pf.write_text("a cat\n")
        with pytest.raises(SystemExit, match="not in the precompute"):
            main(["--model", str(model_dir), "--prompts", str(pf),
                  "--precomputed_dir", str(cache),
                  "--negative_prompt", "never cached",
                  "--width", "16", "--height", "16"])

    def test_warmup_shapes_parse_and_validate(self, model_dir):
        from f_lite_tpu.serve import _parse_warmup_shapes, main

        assert _parse_warmup_shapes("1344x896, 896X1344") == [
            (1344, 896), (896, 1344)
        ]
        with pytest.raises(SystemExit, match="bad entry"):
            _parse_warmup_shapes("1024")
        with pytest.raises(SystemExit, match="multiples of 16"):
            _parse_warmup_shapes("1000x1000")
        with pytest.raises(SystemExit, match="HTTP mode"):
            main(["--model", str(model_dir), "--prompts", "x.txt",
                  "--warmup_shapes", "1024x1024"])

    def test_mode_selection_requires_exactly_one(self, model_dir):
        from f_lite_tpu.serve import main

        with pytest.raises(SystemExit, match="exactly one"):
            main(["--model", str(model_dir)])
        with pytest.raises(SystemExit, match="exactly one"):
            main(["--model", str(model_dir), "--prompts", "x.txt",
                  "--http_port", "8080"])


class TestHTTP:
    """HTTP endpoint over an in-memory tiny pipeline (port 0 = ephemeral)."""

    @pytest.fixture(scope="class")
    def server(self, model_dir):
        import threading

        from f_lite_tpu.serve import build_pipeline, make_http_server, \
            parse_args

        args = parse_args([
            "--model", str(model_dir), "--http_port", "0",
            "--width", "16", "--height", "16", "--steps", "1",
            "--no_text_encoder",
        ])
        pipe = build_pipeline(args)
        srv = make_http_server(pipe, args, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv
        srv.shutdown()
        srv.server_close()

    def _url(self, server, path):
        host, port = server.server_address[:2]
        return f"http://{host}:{port}{path}"

    def _post(self, server, body: dict):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self._url(server, "/generate"),
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers), e.read()

    def test_healthz(self, server):
        import urllib.request

        with urllib.request.urlopen(
            self._url(server, "/healthz"), timeout=30
        ) as resp:
            body = json.loads(resp.read())
        assert body["status"] == "ok"
        assert body["default"]["width"] == 16

    def test_generate_returns_stamped_png(self, server, tmp_path):
        status, headers, body = self._post(server, {"prompt": "a cat"})
        assert status == 200, body
        assert headers["Content-Type"] == "image/png"
        f = tmp_path / "out.png"
        f.write_bytes(body)
        from f_lite_tpu.utils.image import read_metadata

        meta = read_metadata(f)
        assert meta["prompt"] == "a cat"
        assert meta["seed"] == int(headers["X-F-Lite-Seed"])
        # auto-seeds advance: identical bodies -> different seeds
        s2, h2, _ = self._post(server, {"prompt": "a cat"})
        assert s2 == 200
        assert int(h2["X-F-Lite-Seed"]) != meta["seed"]

    def test_generate_explicit_seed_and_shape(self, server, tmp_path):
        status, headers, body = self._post(server, {
            "prompt": "a dog", "seed": 7, "width": 32, "height": 16,
            "steps": 2,
        })
        assert status == 200, body
        assert headers["X-F-Lite-Seed"] == "7"
        f = tmp_path / "o.png"
        f.write_bytes(body)
        from PIL import Image

        with Image.open(f) as im:
            assert im.size == (32, 16)

    @pytest.mark.parametrize("body,frag", [
        ({}, "prompt"),
        ({"prompt": ""}, "prompt"),
        ({"prompt": "x", "width": 20}, "multiples of 16"),
        ({"prompt": "x", "width": 4096}, "width"),
        ({"prompt": "x", "steps": 0}, "steps"),
        ({"prompt": "x", "seed": -1}, "seed"),
        ({"prompt": "x", "sampler": "nope"}, "sampler"),
        ({"prompt": "x", "guidance_scale": "six"}, "guidance_scale"),
    ])
    def test_bad_requests_are_400(self, server, body, frag):
        status, _, resp = self._post(server, body)
        assert status == 400
        assert frag in json.loads(resp)["error"]

    def test_oversized_body_is_413_without_buffering(self, server):
        """The body cap must be enforced from the declared length, BEFORE
        the server reads/buffers it."""
        import http.client

        host, port = server.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.putrequest("POST", "/generate")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(1 << 31))  # 2 GiB declared
        conn.endheaders()
        # send nothing beyond headers: a server that tried to read the
        # declared size would block; the cap answers immediately
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()

    def test_invalid_json_is_400(self, server):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self._url(server, "/generate"), data=b"{nope",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

    @staticmethod
    def _b64_png(w=16, h=16, color=(200, 30, 30)):
        import base64
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, "PNG")
        return base64.b64encode(buf.getvalue()).decode()

    def test_img2img_over_http(self, server, tmp_path):
        status, headers, body = self._post(server, {
            "prompt": "repaint", "seed": 3,
            "image": self._b64_png(), "strength": 0.5,
        })
        assert status == 200, body
        f = tmp_path / "i2i.png"
        f.write_bytes(body)
        from f_lite_tpu.utils.image import read_metadata

        meta = read_metadata(f)
        assert meta["strength"] == 0.5
        assert "inpaint" not in meta
        # identical request WITHOUT the image differs (the input matters)
        s2, _, body2 = self._post(server, {"prompt": "repaint", "seed": 3})
        assert s2 == 200 and body2 != body

    def test_inpaint_over_http(self, server, tmp_path):
        status, _, body = self._post(server, {
            "prompt": "fix the middle", "seed": 4,
            "image": self._b64_png(),
            "mask_image": self._b64_png(color=(255, 255, 255)),
            "strength": 1.0,
        })
        assert status == 200, body
        f = tmp_path / "inp.png"
        f.write_bytes(body)
        from f_lite_tpu.utils.image import read_metadata

        assert read_metadata(f)["inpaint"] is True

    @staticmethod
    def _b64_huge_header_png(w=100_000, h=100_000):
        """Header-only PNG declaring huge dimensions: the server must
        reject on the declared size without decoding pixel data."""
        import base64
        import struct
        import zlib

        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data)))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b""))
               + chunk(b"IEND", b""))
        return base64.b64encode(png).decode()

    @pytest.mark.parametrize("body,frag", [
        ({"prompt": "x", "image": "!!!notb64"}, "invalid base64"),
        ({"prompt": "x", "image": "aGVsbG8="}, "not a decodable image"),
        ({"prompt": "x", "mask_image": "__VALID_PNG__"}, "requires image"),
        ({"prompt": "x", "strength": 2.0}, None),  # no image: ignored
        ({"prompt": "x", "image": "__HUGE_PNG__"}, "too large"),
    ])
    def test_image_field_validation(self, server, body, frag):
        subst = {"__VALID_PNG__": self._b64_png,
                 "__HUGE_PNG__": self._b64_huge_header_png}
        body = {k: subst[v]() if v in subst else v
                for k, v in body.items()}
        status, _, resp = self._post(server, body)
        if frag is None:
            assert status == 200
        else:
            assert status == 400
            assert frag in json.loads(resp)["error"]

    def test_metrics_endpoint(self, server):
        import urllib.request

        # at least one generate has run by now (test order within the
        # class is file order, and the server fixture is class-scoped)
        self._post(server, {"prompt": "metrics probe", "seed": 99})
        with urllib.request.urlopen(
            self._url(server, "/metrics"), timeout=30
        ) as resp:
            assert resp.headers["Content-Type"].startswith("text/plain")
            body = resp.read().decode()
        assert 'f_lite_requests_total{endpoint="generate",status="200"}' \
            in body
        assert "f_lite_images_total" in body
        assert "f_lite_generate_seconds_p50" in body
        # bad requests are counted under their status
        self._post(server, {"prompt": ""})
        with urllib.request.urlopen(
            self._url(server, "/metrics"), timeout=30
        ) as resp:
            body = resp.read().decode()
        assert 'status="400"' in body
        # the compiled-executable cache is observable and LRU-bounded
        line = next(l for l in body.splitlines()
                    if l.startswith("f_lite_compiled_variants "))
        assert 1 <= int(line.split()[1]) <= 32
        assert "f_lite_compiled_evictions_total" in body

    def test_unknown_paths_404(self, server):
        import urllib.error
        import urllib.request

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(self._url(server, "/nope"), timeout=30)
        assert ei.value.code == 404

    def test_concurrent_requests_serialize_on_the_device_lock(self, server):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(3) as ex:
            rs = list(ex.map(
                lambda i: self._post(server, {"prompt": f"p{i}",
                                              "seed": i}),
                range(3),
            ))
        assert all(r[0] == 200 for r in rs)
        seeds = sorted(int(r[1]["X-F-Lite-Seed"]) for r in rs)
        assert seeds == [0, 1, 2]


class TestHTTPPrecomputed:
    def test_uncached_caption_is_400_not_500(self, model_dir, tmp_path):
        """A --precomputed_dir server can only serve cached captions;
        an unknown one is the client's error."""
        import json as _json
        import threading
        import urllib.error
        import urllib.request

        import numpy as np

        from f_lite_tpu.serve import build_pipeline, make_http_server, \
            parse_args
        from f_lite_tpu.text.encoder import caption_cache_key

        cache = tmp_path / "cache"
        (cache / "text_embeddings").mkdir(parents=True)
        np.save(
            cache / "text_embeddings"
            / f"embedding_{caption_cache_key('a cat')}.npy",
            np.random.RandomState(0).randn(8, 32).astype(np.float32),
        )
        args = parse_args([
            "--model", str(model_dir), "--http_port", "0",
            "--width", "16", "--height", "16", "--steps", "1",
            "--precomputed_dir", str(cache),
        ])
        pipe = build_pipeline(args)
        srv = make_http_server(pipe, args, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        host, port = srv.server_address[:2]
        try:
            for prompt, want in (("a cat", 200), ("a dog", 400)):
                req = urllib.request.Request(
                    f"http://{host}:{port}/generate",
                    data=_json.dumps({"prompt": prompt,
                                      "seed": 1}).encode(),
                )
                try:
                    with urllib.request.urlopen(req, timeout=120) as r:
                        assert r.status == want, prompt
                except urllib.error.HTTPError as e:
                    assert e.code == want, prompt
                    assert "precompute" in _json.loads(
                        e.read())["error"]
        finally:
            srv.shutdown()
            srv.server_close()

    def test_warmup_does_not_need_a_cached_caption(self, model_dir,
                                                   tmp_path):
        """run_http warms a precomputed-cache server by embeds — the
        literal 'warmup' caption is never in a cache (a startup crash
        found by a CLI drive)."""
        import numpy as np

        from f_lite_tpu.serve import _warm_by_embeds, build_pipeline, \
            parse_args
        from f_lite_tpu.text.encoder import caption_cache_key

        cache = tmp_path / "cache"
        (cache / "text_embeddings").mkdir(parents=True)
        np.save(
            cache / "text_embeddings"
            / f"embedding_{caption_cache_key('x')}.npy",
            np.zeros((8, 32), np.float32),
        )
        args = parse_args([
            "--model", str(model_dir), "--http_port", "0",
            "--width", "16", "--height", "16", "--steps", "1",
            "--precomputed_dir", str(cache),
        ])
        _warm_by_embeds(build_pipeline(args), args)  # must not raise


class TestGracefulDrain:
    """SIGTERM drain: new work 503s, in-flight finishes, drain_wait
    unblocks (run_http wires SIGTERM to exactly this sequence)."""

    def test_drain_rejects_new_and_finishes_inflight(self):
        import threading
        import time as _time
        import types
        import urllib.error
        import urllib.request

        from PIL import Image

        from f_lite_tpu.serve import make_http_server, parse_args
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        started = threading.Event()

        class SlowPipe:
            text_encoder = ZeroTextEncoder(8, 4)
            vae_scale_factor = 8

            def __call__(self, **kw):
                started.set()
                _time.sleep(1.5)
                img = Image.new("RGB", (kw["width"], kw["height"]))
                return types.SimpleNamespace(images=[img])

        args = parse_args(["--model", "x", "--http_port", "0",
                           "--width", "16", "--height", "16",
                           "--steps", "1", "--no_text_encoder"])
        srv = make_http_server(SlowPipe(), args, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        host, port = srv.server_address[:2]
        url = f"http://{host}:{port}"

        results = []

        def post():
            req = urllib.request.Request(
                url + "/generate", data=b'{"prompt": "x", "seed": 1}')
            with urllib.request.urlopen(req, timeout=60) as resp:
                results.append(resp.status)

        t = threading.Thread(target=post)
        t.start()
        assert started.wait(30)      # request is on the device
        srv.begin_drain()
        # new generation work and readiness probes are rejected
        for path, data in (("/generate", b'{"prompt": "y"}'),
                           ("/healthz", None)):
            req = urllib.request.Request(url + path, data=data)
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 503
        # the in-flight request still completes, then drain unblocks
        assert srv.drain_wait(30.0)
        t.join(timeout=30)
        assert results == [200]
        srv.shutdown()
        srv.server_close()


class TestHTTPBatched:
    """--dp 2 HTTP serving: queued same-shape requests share one
    dp-sharded dispatch (RequestBatcher)."""

    _url = TestHTTP._url
    _post = TestHTTP._post

    @pytest.fixture(scope="class")
    def server(self, model_dir):
        import threading

        from f_lite_tpu.parallel.mesh import clear_mesh_rules
        from f_lite_tpu.serve import build_pipeline, make_http_server, \
            parse_args

        clear_mesh_rules()
        args = parse_args([
            "--model", str(model_dir), "--http_port", "0",
            "--width", "16", "--height", "16", "--steps", "1",
            "--dp", "2", "--batch_window_ms", "500",
            "--no_text_encoder",
        ])
        pipe = build_pipeline(args)
        srv = make_http_server(pipe, args, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv
        srv.shutdown()
        srv.server_close()
        srv.batcher.stop()
        clear_mesh_rules()

    def test_concurrent_same_shape_requests_share_a_dispatch(self, server):
        from concurrent.futures import ThreadPoolExecutor

        # warm the compiled shape first so the batching window isn't
        # consumed by compilation skew
        s0, h0, _ = self._post(server, {"prompt": "warm", "seed": 0})
        assert s0 == 200 and h0["X-F-Lite-Batch"] == "1"
        with ThreadPoolExecutor(2) as ex:
            rs = list(ex.map(
                lambda i: self._post(server, {"prompt": f"p{i}",
                                              "seed": i}),
                range(2),
            ))
        assert all(r[0] == 200 for r in rs)
        # both landed in one dp-sharded dispatch
        assert [r[1]["X-F-Lite-Batch"] for r in rs] == ["2", "2"]

    def test_batched_seed_reproduces_solo_image(self, server):
        """Row i of a shared dispatch must be the image a solo request
        with that seed produces (per-row latents, padded rows exact)."""
        import io

        import numpy as np
        from concurrent.futures import ThreadPoolExecutor
        from PIL import Image

        def pixels(body):
            return np.asarray(
                Image.open(io.BytesIO(body)).convert("RGB"), np.float32
            )

        solo = self._post(server, {"prompt": "same", "seed": 11})
        assert solo[0] == 200
        with ThreadPoolExecutor(2) as ex:
            rs = list(ex.map(
                lambda body: self._post(server, body),
                [{"prompt": "same", "seed": 11},
                 {"prompt": "other", "seed": 12,
                  "negative_prompt": "blurry"}],
            ))
        assert all(r[0] == 200 for r in rs)
        assert np.max(np.abs(pixels(rs[0][2]) - pixels(solo[2]))) <= 2.0

    def test_batcher_traces_under_construction_mesh(self):
        """use_mesh_rules lives in a contextvar, which does NOT propagate
        to new threads — the batcher must capture the construction
        context or the dp sharding rules are silently inert in HTTP mode
        (every trace happens in the dispatcher thread)."""
        import types

        import jax
        import jax.numpy as jnp
        from PIL import Image

        from f_lite_tpu.parallel import create_mesh
        from f_lite_tpu.parallel.mesh import (
            active_mesh_rules,
            clear_mesh_rules,
            use_mesh_rules,
        )
        from f_lite_tpu.serve import RequestBatcher, parse_args
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        seen = []

        class FakePipe:
            text_encoder = ZeroTextEncoder(8, 4)
            vae_scale_factor = 8
            dit_model = types.SimpleNamespace(
                config=types.SimpleNamespace(
                    in_channels=4, dtype=jnp.bfloat16
                )
            )

            def __call__(self, **kw):
                seen.append(active_mesh_rules())
                n = kw["latents"].shape[0]
                img = Image.new("RGB", (kw["width"], kw["height"]))
                return types.SimpleNamespace(images=[img] * n)

        args = parse_args(["--model", "x", "--http_port", "0",
                           "--dp", "2"])
        mesh = create_mesh(dp=2, devices=jax.devices()[:2])
        use_mesh_rules(mesh)
        try:
            b = RequestBatcher.from_args(FakePipe(), args)
            b.submit(dict(prompt="p", negative_prompt=None, width=16,
                          height=16, steps=1, guidance_scale=6.0,
                          sampler="euler", seed=0)).result(timeout=60)
            b.stop()
        finally:
            clear_mesh_rules()
        assert seen and seen[0] is not None and seen[0][0] is mesh

    def test_image_inputs_rejected_when_batching(self, server):
        status, _, resp = self._post(server, {
            "prompt": "x", "image": TestHTTP._b64_png(),
        })
        assert status == 400
        assert "--dp 1" in json.loads(resp)["error"]

    def test_different_shapes_do_not_batch(self, server):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as ex:
            rs = list(ex.map(
                lambda body: self._post(server, body),
                [{"prompt": "a", "seed": 1},
                 {"prompt": "b", "seed": 2, "width": 32}],
            ))
        assert all(r[0] == 200 for r in rs)
        assert [r[1]["X-F-Lite-Batch"] for r in rs] == ["1", "1"]


class TestServeLoRA:
    """`serve --lora_path` merges a fine-tuned adapter at load (both the
    framework safetensors and the reference peft .pt formats)."""

    @pytest.fixture(scope="class")
    def lora_setup(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("lora_model")
        cfg = DiTConfig(
            in_channels=4, patch_size=2, hidden_size=64, depth=2,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=32,
            use_pallas_attention=False,
        )
        dit = DiT(cfg)
        params = dit.init_params(jax.random.key(0), text_len=8,
                                 image_size=8)
        # perturb so final_proj is non-zero and LoRA deltas reach the pixels
        params = jax.tree.map(lambda p: p + 0.01, params)
        vae = AutoencoderKL(VAEConfig.tiny())
        vparams = vae.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
        FLitePipeline(dit, params, vae, vparams,
                      ZeroTextEncoder(32, 8)).save_pretrained(d / "model")

        from f_lite_tpu.train.lora import init_lora_params, save_lora_weights

        lora = init_lora_params(jax.random.key(2), params, rank=2)
        lora = jax.tree.map(lambda x: x + 0.05, lora)
        save_lora_weights(lora, d)
        return d

    def _images(self, model, extra):
        from f_lite_tpu.serve import build_pipeline, parse_args

        args = parse_args([
            "--model", str(model), "--prompts", "unused.txt",
            "--no_text_encoder", *extra,
        ])
        pipe = build_pipeline(args)
        return pipe(prompt="l", height=16, width=16,
                    num_inference_steps=1, seed=7,
                    output_type="np").images

    def test_lora_path_changes_output_scale_zero_is_identity(
            self, lora_setup):
        import numpy as np

        st = lora_setup / "lora_weights.safetensors"
        base = self._images(lora_setup / "model", [])
        merged = self._images(lora_setup / "model",
                              ["--lora_path", str(st)])
        zero = self._images(lora_setup / "model",
                            ["--lora_path", str(st), "--lora_scale", "0"])
        assert not np.array_equal(base, merged)
        np.testing.assert_array_equal(base, zero)

    def test_reference_peft_pt_served(self, lora_setup, tmp_path):
        import sys

        import numpy as np

        sys.path.insert(0, "tools")
        from convert_checkpoint import main as convert_main

        convert_main(["--export_lora",
                      str(lora_setup / "lora_weights.safetensors"),
                      "--output_dir", str(tmp_path)])
        st = self._images(lora_setup / "model", [
            "--lora_path", str(lora_setup / "lora_weights.safetensors")])
        pt = self._images(lora_setup / "model", [
            "--lora_path", str(tmp_path / "lora_weights.pt")])
        np.testing.assert_array_equal(st, pt)
