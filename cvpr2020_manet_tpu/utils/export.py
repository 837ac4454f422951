"""AOT model export: portable serving artifacts via `jax.export`.

Production-serving story: trace + lower the flagship forward ONCE, ship
the serialized StableHLO artifact to the serving fleet, and run it there
without the Python model code and without re-tracing (the target backend
still compiles the embedded StableHLO once; the persistent compilation
cache amortizes that across processes). Shapes are static by design
(config.py bucket policy), so one artifact per (image_size, object
bucket) is the natural unit.

Artifact layout — one `.ivosx` file:

    IVOSX1\n
    <manifest JSON, one line>\n
    <raw jax.export blob>

The manifest pins the jax version, lowering platforms, argument/result
avals and a caller-supplied config fingerprint, so mismatches fail
loudly at load time instead of cryptically at dispatch time.

Parity note: the reference distributes torch checkpoints and rebuilds
the model in Python at load time (ref: expected `eval_manet.py` restore
path — mount empty all rounds, SURVEY.md §0). A TPU-native framework can
do better for serving: the compiler-level graph IS the deployment
contract. Checkpoints (utils/checkpoint.py) remain the TRAINING
artifact; this module is the SERVING artifact.

Pallas caveat: the TPU matching kernels lower to `tpu_custom_call`,
which `jax.export` only accepts with an explicit safety override (the
call is platform-pinned and non-portable by definition). `export_forward`
applies that override automatically when 'tpu' is among the platforms;
multi-platform artifacts therefore require the jnp matching backend.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_MAGIC = b"IVOSX1\n"
FORMAT = "ivosx/1"


# --------------------------------------------------------------------- #
# forward-step construction
# --------------------------------------------------------------------- #

def build_round_forward(model, variables, image_size: Tuple[int, int],
                        num_objects: int, pad_to: int = 32):
    """-> (fn, example_args): the single-frame interaction-round core.

    One interaction round on one frame: feature extraction, interaction
    branch on the scribble rasters, memory aggregation (first round), and
    propagation (global/local matching + decoder) against the annotated
    frame itself. This is the same surface `__graft_entry__.entry()`
    compile-checks, parameterized over spatial size and object bucket.

    fn(image (H, W, 3) f32, pos_scr (h, w, O) f32, neg_scr (h, w, O) f32)
      -> per-pixel class probabilities (h, w, O) f32, h = H/4 (stride 4).
    """
    h, w = image_size
    hp, wp = h + (-h) % pad_to, w + (-w) % pad_to
    hh, ww = hp // 4, wp // 4
    o = num_objects + 1

    def fn(image, pos_scr, neg_scr):
        pad = ((0, hp - h), (0, wp - w), (0, 0))
        img = jnp.pad(image, pad)
        feat, emb = model.apply(variables, img[None],
                                method=model.extract_features)
        f0, e0 = feat[0], emb[0]
        bg = jnp.zeros((hh, ww, o)).at[..., 0].set(1.0)
        int_feats, int_logits = model.apply(
            variables, f0, pos_scr, neg_scr, bg, method=model.interact)
        mem = model.apply(variables, int_feats, jnp.zeros_like(int_feats),
                          True, method=model.aggregate_memory)
        lab = jnp.argmax(int_logits, axis=-1)
        ref_onehot = jax.nn.one_hot(lab.reshape(-1), o, dtype=jnp.float32)
        logits, _ = model.apply(
            variables, f0, e0, e0.reshape(-1, e0.shape[-1]), ref_onehot,
            None, jnp.ones((hh, ww, o), jnp.float32), e0, bg, mem,
            jnp.ones((o,), jnp.float32), method=model.propagate)
        return jax.nn.softmax(logits, axis=-1)

    example_args = (
        jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((hh, ww, o), jnp.float32),
        jnp.zeros((hh, ww, o), jnp.float32),
    )
    return fn, example_args


# --------------------------------------------------------------------- #
# export / save / load
# --------------------------------------------------------------------- #

def export_forward(model, variables, image_size: Tuple[int, int],
                   num_objects: int, *,
                   platforms: Sequence[str] = ("tpu",),
                   pad_to: int = 32):
    """Lower the round-forward for `platforms` -> jax.export.Exported."""
    from jax import export as jex

    fn, example_args = build_round_forward(
        model, variables, image_size, num_objects, pad_to=pad_to)
    checks = []
    if "tpu" in platforms:
        # Pallas matching kernels are tpu_custom_call custom calls.
        checks.append(jex.DisabledSafetyCheck.custom_call("tpu_custom_call"))
    return jex.export(jax.jit(fn), platforms=tuple(platforms),
                      disabled_checks=checks)(*example_args)


def _aval_json(avals) -> list:
    return [[list(a.shape), jnp.dtype(a.dtype).name] for a in avals]


def save_artifact(exported, path: str,
                  extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Write the .ivosx artifact; returns the manifest dict."""
    manifest = {
        "format": FORMAT,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "in_avals": _aval_json(exported.in_avals),
        "out_avals": _aval_json(exported.out_avals),
    }
    if extra:
        manifest.update(extra)
    # normalize (tuples -> lists) so the returned dict equals the loaded one
    manifest = json.loads(json.dumps(manifest, sort_keys=True))
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(json.dumps(manifest, sort_keys=True).encode() + b"\n")
        f.write(blob)
    return manifest


@dataclasses.dataclass(frozen=True)
class LoadedArtifact:
    """A deserialized serving artifact. `call` runs the embedded graph."""
    manifest: Dict[str, Any]
    exported: Any

    @property
    def call(self) -> Callable:
        return self.exported.call

    def __call__(self, *args):
        return self.exported.call(*args)


def load_artifact(path: str) -> LoadedArtifact:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(
                f"{path}: not an {FORMAT} artifact (bad magic {magic!r})")
        line = f.readline()
        try:
            manifest = json.loads(line)
        except json.JSONDecodeError as e:
            raise ValueError(f"{path}: corrupt manifest: {e}") from e
        if manifest.get("format") != FORMAT:
            raise ValueError(
                f"{path}: unsupported format {manifest.get('format')!r}")
        blob = f.read()
    from jax import export as jex
    try:
        exported = jex.deserialize(blob)
    except Exception as e:
        raise ValueError(f"{path}: corrupt export blob: {e}") from e
    return LoadedArtifact(manifest=manifest, exported=exported)
