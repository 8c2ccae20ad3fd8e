"""Checkpoint save/resume round-trips (SURVEY.md §5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ivit_tpu.models import VisionTransformer
from ivit_tpu.train import create_train_state, make_train_step
from ivit_tpu.utils import (
    load_artifact,
    load_checkpoint,
    load_checkpoint_raw,
    save_artifact,
    save_checkpoint,
)


def tiny_state():
    model = VisionTransformer(
        img_size=16, patch_size=8, num_classes=8,
        embed_dim=32, depth=1, num_heads=4,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 16, 16, 3))
    tx = optax.adamw(1e-3)
    state = create_train_state(model, rng, x[:1], tx, ema_decay=0.9)
    return model, state, x


class TestCheckpoint:
    def test_full_state_round_trip(self, tmp_path):
        model, state, x = tiny_state()
        step = jax.jit(make_train_step(model, ema_decay=0.9))
        targets = jax.nn.one_hot(jnp.zeros((4,), jnp.int32), 8)
        state, _ = step(state, x, targets, jax.random.PRNGKey(1))

        path = os.path.join(tmp_path, "ckpt.pkl")
        save_checkpoint(path, state, {"epoch": 3, "best_acc1": 12.5})

        _, fresh, _ = tiny_state()
        restored, extra = load_checkpoint(path, fresh)
        assert extra == {"epoch": 3, "best_acc1": 12.5}
        assert int(restored.step) == 1
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer moments and EMA restored too
        for a, b in zip(jax.tree.leaves(state.opt_state),
                        jax.tree.leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # resumed training continues without error
        state2, m = step(restored, x, targets, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))

    def test_raw_restore_for_converter(self, tmp_path):
        model, state, x = tiny_state()
        path = os.path.join(tmp_path, "ckpt.pkl")
        save_checkpoint(path, state, {})
        raw, _ = load_checkpoint_raw(path)
        assert "params" in raw and "quant_stats" in raw
        # raw params usable by the deploy converter
        from ivit_tpu.deploy import freeze_vit

        artifact = freeze_vit(
            model, {"params": raw["params"], "quant_stats": raw["quant_stats"]}
        )
        assert artifact["patch_embed"]["w"].dtype == np.int8

    def test_orbax_round_trip(self, tmp_path):
        from ivit_tpu.utils import load_checkpoint_orbax, save_checkpoint_orbax

        model, state, x = tiny_state()
        d = os.path.join(tmp_path, "orbax_ckpt")
        save_checkpoint_orbax(d, state, {"epoch": 7})
        _, fresh, _ = tiny_state()
        restored, extra = load_checkpoint_orbax(d, fresh)
        assert extra["epoch"] == 7
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_artifact_round_trip(self, tmp_path):
        model, state, x = tiny_state()
        from ivit_tpu.deploy import build_vit_infer, freeze_vit

        artifact = freeze_vit(
            model,
            jax.tree.map(
                np.asarray,
                {"params": state.params, "quant_stats": state.quant_stats},
            ),
        )
        path = os.path.join(tmp_path, "artifact.pkl")
        save_artifact(path, artifact)
        loaded = load_artifact(path)
        a = build_vit_infer(artifact, use_pallas=False)(x)
        b = build_vit_infer(loaded, use_pallas=False)(x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestUrlResolve:
    """Security posture of URL checkpoint resolution (advisor round-2
    medium): https-only, URL-hash-keyed cache, hub hash verification."""

    def test_plain_http_refused(self, monkeypatch):
        import pytest

        from ivit_tpu.utils.checkpoint import _resolve

        monkeypatch.delenv("IVIT_ALLOW_INSECURE_URL", raising=False)
        with pytest.raises(ValueError, match="refusing plain-http"):
            _resolve("http://example.com/checkpoint.pth")

    def test_cache_keyed_by_full_url(self, monkeypatch, tmp_path):
        import urllib.request

        from ivit_tpu.utils.checkpoint import _resolve

        monkeypatch.setenv("HOME", str(tmp_path))
        calls = []

        def fake_retrieve(url, dst):
            calls.append(url)
            with open(dst, "wb") as f:
                f.write(url.encode())

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        a = _resolve("https://a.example/checkpoint.pth")
        b = _resolve("https://b.example/checkpoint.pth")
        assert a != b, "same-basename URLs must not collide in the cache"
        assert open(a, "rb").read() == b"https://a.example/checkpoint.pth"
        assert open(b, "rb").read() == b"https://b.example/checkpoint.pth"
        # second resolve of the same URL hits the cache
        _resolve("https://a.example/checkpoint.pth")
        assert len(calls) == 2

    def test_hub_hash_verified(self, monkeypatch, tmp_path):
        import hashlib
        import urllib.request

        import pytest

        from ivit_tpu.utils.checkpoint import _resolve

        monkeypatch.setenv("HOME", str(tmp_path))
        payload = b"model bytes"
        good = hashlib.sha256(payload).hexdigest()[:8]

        def fake_retrieve(url, dst):
            with open(dst, "wb") as f:
                f.write(payload)

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        # matching hash passes
        p = _resolve(f"https://x.example/deit-{good}.pth")
        assert open(p, "rb").read() == payload
        # wrong hash is deleted and raises
        with pytest.raises(ValueError, match="filename-hash"):
            _resolve("https://x.example/deit-deadbeef.pth")

    def test_cache_hit_reverified_after_skip(self, monkeypatch, tmp_path):
        """A hash-named file accepted while IVIT_SKIP_HASH_CHECK=1 was
        exported must NOT bypass verification forever: the first resolve
        without the env var re-hashes the cached file, evicts the
        corrupt one, and a retry re-downloads."""
        import urllib.request

        import pytest

        from ivit_tpu.utils.checkpoint import _resolve

        monkeypatch.setenv("HOME", str(tmp_path))
        calls = []

        def fake_retrieve(url, dst):
            calls.append(url)
            with open(dst, "wb") as f:
                f.write(b"corrupted bytes")

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        url = "https://x.example/deit-deadbeef.pth"
        monkeypatch.setenv("IVIT_SKIP_HASH_CHECK", "1")
        p = _resolve(url)  # accepted unverified under the escape hatch
        assert open(p, "rb").read() == b"corrupted bytes"
        monkeypatch.delenv("IVIT_SKIP_HASH_CHECK")
        with pytest.raises(ValueError, match="filename-hash"):
            _resolve(url)  # cache hit re-verified → evicted
        assert not list(tmp_path.glob(".cache/ivit_tpu/checkpoints/*.pth"))
        with pytest.raises(ValueError, match="filename-hash"):
            _resolve(url)  # eviction forces a fresh download
        assert len(calls) == 2

    def test_hash_check_escape_hatch(self, monkeypatch, tmp_path):
        """A hex-looking suffix that is NOT a hash (weights-beefcafe.pth)
        would otherwise be refused forever; IVIT_SKIP_HASH_CHECK=1 is
        the documented escape hatch."""
        import urllib.request

        from ivit_tpu.utils.checkpoint import _resolve

        monkeypatch.setenv("HOME", str(tmp_path))
        payload = b"not named after its hash"

        def fake_retrieve(url, dst):
            with open(dst, "wb") as f:
                f.write(payload)

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        monkeypatch.setenv("IVIT_SKIP_HASH_CHECK", "1")
        p = _resolve("https://x.example/weights-beefcafe.pth")
        assert open(p, "rb").read() == payload
