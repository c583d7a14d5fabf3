"""AOT serving export: the flagship eval forward as a serialized StableHLO
artifact (`jax.export`) plus its weights.

The reference has no serving story at all — deployment means cloning the
repo and running ``test.py`` under eager torch (reference test.py:86-100).
Here the restoration forward (encoder -> inter -> decoder, the eval
composition of model.py:66-70) is exported once to a self-contained
``.fairm`` artifact that any process with jax + the matching backend can
deserialize and call — no model code, no config system, no checkpoint
loading at serve time.

Design notes (TPU-specific):

* Weights are stored as ARRAYS in the artifact and passed as call
  arguments — NOT closed over. Closing over them would bake tens of MB of
  HLO constants into the program, which bloats compiles and (on the
  tunneled backend) can exceed the remote program-size limit (CLAUDE.md).
* Batch is exported at a fixed size: restoration tiles are
  ``crop_test_imgs_size`` squares, servers batch tiles, and a fixed batch
  with host-side padding is the static-shape contract XLA wants
  (SURVEY §7). ``ServingModel.__call__`` pads/crops automatically.

Artifact layout (single file): 16-byte header (magic + version + metadata
length), JSON metadata (shapes, platforms, weight-tree paths), an
``.npz`` blob with the flattened weights, then the ``jax.export`` bytes.

Use :func:`export_eval` / :func:`load`, or the ``tools/export_serving.py``
CLI.
"""

from __future__ import annotations

import dataclasses
import io
import json
import struct
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = b"FAIRMSRV"
VERSION = 1


def _flatten_with_paths(tree):
    """Flatten a nested-dict pytree to (["a/b/c", ...], [leaf, ...])."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    paths, leaves = [], []
    for kp, leaf in flat:
        parts = []
        for k in kp:
            if not isinstance(k, jax.tree_util.DictKey):
                raise TypeError(
                    "serving export requires plain-dict variable trees "
                    f"(got path entry {k!r})")
            parts.append(str(k.key))
        paths.append("/".join(parts))
        leaves.append(np.asarray(leaf))
    return paths, leaves


def _unflatten_from_paths(paths, leaves):
    tree: dict = {}
    for path, leaf in zip(paths, leaves):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def export_eval(cfg, variables, batch: int = 8,
                platforms: Optional[Sequence[str]] = None) -> bytes:
    """Export the eval forward with ``variables = (enc_vars, dec_vars)``.

    Returns the serialized artifact bytes. ``platforms`` defaults to the
    current backend; pass ``("tpu",)`` to cross-compile an artifact for
    TPU serving from a CPU host.
    """
    from .models.airnet import build_models, eval_forward

    bundle = build_models(cfg, eval_mode=True)
    enc_vars, dec_vars = variables
    p = cfg.crop_test_imgs_size

    def fn(enc_vars, dec_vars, x):
        return eval_forward(bundle, enc_vars, dec_vars, x)

    spec = lambda t: jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), t)
    x_spec = jax.ShapeDtypeStruct((batch, p, p, 3), jnp.float32)
    exp = jax.export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None)(
            spec(enc_vars), spec(dec_vars), x_spec)
    payload = exp.serialize()

    enc_paths, enc_leaves = _flatten_with_paths(enc_vars)
    dec_paths, dec_leaves = _flatten_with_paths(dec_vars)
    buf = io.BytesIO()
    np.savez(buf, *(enc_leaves + dec_leaves))
    weights = buf.getvalue()

    meta = json.dumps({
        "format": VERSION,
        "input_shape": [batch, p, p, 3],
        "input_dtype": "float32",
        "platforms": list(exp.platforms),
        "enc_paths": enc_paths,
        "dec_paths": dec_paths,
        "weights_len": len(weights),
        "eval_dtype": cfg.eval_dtype,
        "encoder_type": cfg.encoder_type,
        "decoder_type": cfg.decoder_type,
        "jax_version": jax.__version__,
    }).encode()
    header = MAGIC + struct.pack("<II", VERSION, len(meta))
    return header + meta + weights + bytes(payload)


@dataclasses.dataclass(frozen=True)
class ServingModel:
    """A deserialized restoration server: ``model(tiles) -> restored``."""

    meta: dict
    enc_vars: dict
    dec_vars: dict
    _exported: "jax.export.Exported"

    @property
    def input_shape(self) -> Tuple[int, ...]:
        return tuple(self.meta["input_shape"])

    def __call__(self, tiles) -> jax.Array:
        """Restore a ``[B, p, p, 3]`` float32 tile batch (B may be smaller
        than the exported batch: inputs are zero-padded and the pad rows
        dropped from the output)."""
        tiles = jnp.asarray(tiles, jnp.float32)
        b_exp = self.input_shape[0]
        b = tiles.shape[0]
        if tuple(tiles.shape[1:]) != self.input_shape[1:]:
            raise ValueError(
                f"expected tiles [*, {self.input_shape[1:]}], got {tiles.shape}")
        if b > b_exp:
            raise ValueError(f"batch {b} exceeds exported batch {b_exp}; "
                             "split into chunks")
        if b < b_exp:
            pad = jnp.zeros((b_exp - b,) + tuple(self.input_shape[1:]),
                            jnp.float32)
            tiles = jnp.concatenate([tiles, pad], axis=0)
        out = self._exported.call(self.enc_vars, self.dec_vars, tiles)
        return out[:b]


def loads(blob: bytes) -> ServingModel:
    if blob[:8] != MAGIC:
        raise ValueError("not a FAIRM serving artifact")
    version, mlen = struct.unpack("<II", blob[8:16])
    if version != VERSION:
        raise ValueError(f"unsupported artifact version {version}")
    meta = json.loads(blob[16:16 + mlen].decode())
    woff = 16 + mlen
    wlen = meta["weights_len"]
    n_enc = len(meta["enc_paths"])
    n = n_enc + len(meta["dec_paths"])
    with np.load(io.BytesIO(blob[woff:woff + wlen])) as z:
        leaves = [z[f"arr_{i}"] for i in range(n)]
    enc_vars = _unflatten_from_paths(meta["enc_paths"], leaves[:n_enc])
    dec_vars = _unflatten_from_paths(meta["dec_paths"], leaves[n_enc:])
    exp = jax.export.deserialize(bytearray(blob[woff + wlen:]))
    return ServingModel(meta=meta, enc_vars=enc_vars, dec_vars=dec_vars,
                        _exported=exp)


def save(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load(path: str) -> ServingModel:
    with open(path, "rb") as f:
        return loads(f.read())
