"""Checkpointing: params + quantization state + optimizer, via Orbax.

The reference saves the best state_dict including integer/scale buffers
(/root/reference/quant_train.py:256-261; SURVEY.md §5.4). Here the
checkpoint is the full TrainState pytree — params, ``quant_stats`` EMA
ranges (the scales), optimizer state, EMA params — so resume and deploy
conversion both read one artifact.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state, extra: dict | None = None):
    """Serialize a TrainState (or any pytree) + metadata to ``path``.

    Stored as a plain nested state-dict so consumers that only need a
    subtree (e.g. the deploy converter reading params+quant_stats) can
    restore without reconstructing the optimizer pytree.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "state": serialization.to_state_dict(jax.tree.map(np.asarray, state)),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def _resolve(path: str) -> str:
    """Accept a local path or an https URL (the reference resumes from
    URLs via torch.hub, quant_train.py:217-220); URLs download into the
    hub cache once.

    Security posture (checkpoints are **pickle** — loading one executes
    code, so they must come from trusted sources):

    * https only; plain ``http://`` is refused unless the caller opts in
      via ``IVIT_ALLOW_INSECURE_URL=1``.
    * The cache is keyed by a hash of the FULL URL, not the basename, so
      two different URLs ending in ``checkpoint.pth`` cannot collide.
    * torch-hub hash-in-filename convention: a basename matching
      ``name-<hexdigits>.pth`` has its sha256 verified against that
      prefix after download (mismatch deletes the file and raises).
    """
    if path.startswith("http://") and not os.environ.get(
        "IVIT_ALLOW_INSECURE_URL"
    ):
        raise ValueError(
            f"refusing plain-http checkpoint URL {path!r}: checkpoints "
            "are pickle (code execution on load) and must be fetched "
            "over TLS. Use https://, or set IVIT_ALLOW_INSECURE_URL=1 "
            "if you really trust the network path."
        )
    if path.startswith(("http://", "https://")):
        import hashlib
        import re
        import urllib.parse
        import urllib.request

        cache = os.path.expanduser("~/.cache/ivit_tpu/checkpoints")
        os.makedirs(cache, exist_ok=True)
        fname = os.path.basename(urllib.parse.urlparse(path).path)
        url_key = hashlib.sha256(path.encode()).hexdigest()[:16]
        dst = os.path.join(cache, f"{url_key}-{fname}")
        if not os.path.exists(dst):
            tmp = dst + ".tmp"
            urllib.request.urlretrieve(path, tmp)
            os.replace(tmp, dst)
        # torch-hub convention: trailing hex token = sha256 prefix.
        # Require at least one [a-f] so all-digit suffixes (dates,
        # versions: ckpt-20250816.pth) are not mistaken for hashes
        # and refused — an 8+-digit sha prefix with no letter is
        # ~2% of real hashes, and those simply skip verification.
        # IVIT_SKIP_HASH_CHECK=1 is the escape hatch for legitimate
        # filenames whose hex-looking suffix is NOT a hash (e.g.
        # weights-beefcafe.pth) — otherwise such a URL would be
        # re-downloaded and refused forever with no recourse.
        # Verified on EVERY load, cache hits included (one sha256 pass
        # per resolve): a file accepted while IVIT_SKIP_HASH_CHECK=1
        # was exported globally must not bypass verification forever —
        # the first load without the env var catches (and evicts) a
        # corrupted cached download.
        m = re.search(r"-([0-9a-f]{8,64})\.[^.]+$", fname)
        if (m and re.search(r"[a-f]", m.group(1))
                and os.environ.get("IVIT_SKIP_HASH_CHECK") != "1"):
            digest = hashlib.sha256()
            with open(dst, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    digest.update(chunk)
            if not digest.hexdigest().startswith(m.group(1)):
                os.remove(dst)
                raise ValueError(
                    f"checkpoint {path!r} failed its filename-hash "
                    f"check: sha256 {digest.hexdigest()[:16]}… does "
                    f"not start with {m.group(1)!r} (corrupt download "
                    f"evicted from cache — retry to re-fetch). If the "
                    f"suffix is not actually a hash, set "
                    f"IVIT_SKIP_HASH_CHECK=1."
                )
        return dst
    return path


def load_checkpoint(path: str, target):
    """Restore into the structure of ``target``; returns (state, extra).
    ``path`` may be a local file or an http(s) URL."""
    with open(_resolve(path), "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_state_dict(target, payload["state"])
    return state, payload.get("extra", {})


def load_checkpoint_raw(path: str):
    """Return the raw nested state-dict + extra (no target needed).
    ``path`` may be a local file or an http(s) URL."""
    with open(_resolve(path), "rb") as f:
        payload = pickle.load(f)
    return payload["state"], payload.get("extra", {})


def save_checkpoint_orbax(dirpath: str, state, extra: dict | None = None):
    """Orbax saver — the multi-host/sharded-array path (each host writes
    its shards; the pickle path above is single-host only). Metadata goes
    to a JSON sidecar."""
    import json

    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dirpath, serialization.to_state_dict(state), force=True)
    ckptr.wait_until_finished()
    with open(dirpath + ".extra.json", "w") as f:
        json.dump(extra or {}, f)


def load_checkpoint_orbax(dirpath: str, target):
    import json

    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    ckptr = ocp.StandardCheckpointer()
    tpl = serialization.to_state_dict(jax.tree.map(np.asarray, target))
    payload = ckptr.restore(dirpath, target=tpl)
    state = serialization.from_state_dict(target, payload)
    extra = {}
    if os.path.exists(dirpath + ".extra.json"):
        with open(dirpath + ".extra.json") as f:
            extra = json.load(f)
    return state, extra


def save_artifact(path: str, artifact: dict):
    """Persist a deploy artifact (the ``params.npy`` analogue,
    /root/reference/TVM_benchmark/convert_model.py:66)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(artifact, f, protocol=4)


def load_artifact(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
