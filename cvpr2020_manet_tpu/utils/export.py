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
                        num_objects: int, pad_to: int = 16):
    """-> (fn, example_args): the single-frame interaction-round core.

    One interaction round on one frame: feature extraction, interaction
    branch on the scribble rasters, memory aggregation (first round), and
    propagation (global/local matching + decoder) against the annotated
    frame itself. This is the same surface `__graft_entry__.entry()`
    compile-checks, parameterized over spatial size and object bucket.

    fn(image (H, W, 3) f32, pos_scr (h, w, O) f32, neg_scr (h, w, O) f32)
      -> per-pixel class probabilities (h, w, O) f32, at feature
      resolution of the PADDED image: h = (H + (-H) % pad_to) // 4
      (the manifest records image_size/pad_to/feature_stride so hosts
      can derive the scribble grid and crop outputs back to the image).
    """
    h, w = image_size
    hp, wp = h + (-h) % pad_to, w + (-w) % pad_to
    hh, ww = hp // 4, wp // 4
    o = num_objects + 1

    def fn(image, pos_scr, neg_scr):
        # skip the no-op pad for aligned sizes (keeps the traced graph —
        # and its persistent-cache key — free of a zero-width pad op)
        img = image if (hp, wp) == (h, w) else jnp.pad(
            image, ((0, hp - h), (0, wp - w), (0, 0)))
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


def build_serving_fns(model, variables, image_size: Tuple[int, int],
                      num_objects: int, pad_to: int = 16
                      ) -> Dict[str, Tuple[Callable, tuple]]:
    """name -> (fn, example_args): the per-frame serving loop, staged.

    A serving host drives the full interactive-VOS loop from these five
    graphs alone (no Python model code), keeping the state arrays
    (features, embeddings, matching memory, MA memory, masks) itself:

      extract(image (H,W,3))               -> feat (h,w,Cd), emb (h,w,Ce)
      interact(feat, pos, neg, prev_mask)  -> int_feats (O,h,w,Cma),
                                              probs (h,w,O)
      aggregate_first(int_feats)           -> memory (O,h,w,Cma)
      aggregate_update(int_feats, memory)  -> memory
      propagate(feat, emb, ref_emb (N,Ce), ref_onehot (N,O),
                gmap_prev, prev_emb, prev_mask, memory, obj_valid)
                                           -> probs (h,w,O), gmap (h,w,O)

    N (matching-memory rows) is one annotated frame's pixels (h*w);
    stack rounds by re-running propagate with min-fused gmap_prev, the
    same policy engine/evaluator.py uses in 'min_fused' mode. All shapes
    static per artifact (config.py bucket policy).
    """
    h, w = image_size
    hp, wp = h + (-h) % pad_to, w + (-w) % pad_to
    hh, ww = hp // 4, wp // 4
    o = num_objects + 1
    cfg = model.cfg
    cd, ce, cma = cfg.decoder_channels, cfg.embedding_dim_padded, \
        cfg.ma_channels

    def extract(image):
        img = image if (hp, wp) == (h, w) else jnp.pad(
            image, ((0, hp - h), (0, wp - w), (0, 0)))
        feat, emb = model.apply(variables, img[None],
                                method=model.extract_features)
        return feat[0], emb[0]

    def interact(feat, pos_scr, neg_scr, prev_mask):
        int_feats, logits = model.apply(
            variables, feat, pos_scr, neg_scr, prev_mask,
            method=model.interact)
        return int_feats, jax.nn.softmax(logits, axis=-1)

    def aggregate_first(int_feats):
        return model.apply(variables, int_feats, jnp.zeros_like(int_feats),
                           True, method=model.aggregate_memory)

    def aggregate_update(int_feats, memory):
        return model.apply(variables, int_feats, memory, False,
                           method=model.aggregate_memory)

    def propagate(feat, emb, ref_emb, ref_onehot, gmap_prev, prev_emb,
                  prev_mask, memory, obj_valid):
        logits, gmap = model.apply(
            variables, feat, emb, ref_emb, ref_onehot, None, gmap_prev,
            prev_emb, prev_mask, memory, obj_valid, method=model.propagate)
        return jax.nn.softmax(logits, axis=-1), gmap

    mdtype = jnp.dtype(cfg.dtype)
    feat_s = jnp.zeros((hh, ww, cd), mdtype)
    emb_s = jnp.zeros((hh, ww, ce), mdtype)   # embedding head runs in mdtype
    maps_s = jnp.zeros((hh, ww, o), jnp.float32)
    mem_s = jnp.zeros((o, hh, ww, cma), mdtype)
    return {
        "extract": (extract, (jnp.zeros((h, w, 3), jnp.float32),)),
        "interact": (interact, (feat_s, maps_s, maps_s, maps_s)),
        "aggregate_first": (aggregate_first, (mem_s,)),
        "aggregate_update": (aggregate_update, (mem_s, mem_s)),
        "propagate": (propagate, (feat_s, emb_s,
                                  jnp.zeros((hh * ww, ce), mdtype),
                                  jnp.zeros((hh * ww, o), jnp.float32),
                                  maps_s, emb_s, maps_s, mem_s,
                                  jnp.ones((o,), jnp.float32))),
    }


# --------------------------------------------------------------------- #
# export / save / load
# --------------------------------------------------------------------- #

def wrap_raw_image(fn, example_args):
    """Image arg becomes RAW uint8 RGB; ImageNet normalization moves
    INSIDE the exported graph (the serving contract should not require
    the host to know the training-time transform, and uint8 frames are
    4x fewer upload bytes — same device-side preprocessing as
    engine/propagate_batch.preprocess_frames)."""
    from cvpr2020_manet_tpu.data.davis import IMAGENET_MEAN, IMAGENET_STD

    def wrapped(image, *rest):
        x = image.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return fn(x, *rest)

    return wrapped, (jnp.zeros(example_args[0].shape, jnp.uint8),
                     *example_args[1:])


def wrap_yuv420_image(fn, example_args):
    """Image arg becomes the video decoder's planar YUV 4:2:0 pair —
    y (H, W) + uv (H/2, W/2, 2) uint8, HALF the bytes of uint8 RGB —
    with the BT.601 inverse + ImageNet normalization inside the exported
    graph (utils/ingest.py; the natural live-video serving contract,
    since H.264/VP9 decoders emit planar YUV)."""
    from cvpr2020_manet_tpu.data.davis import IMAGENET_MEAN, IMAGENET_STD
    from cvpr2020_manet_tpu.utils.ingest import yuv420_to_rgb

    h, w = example_args[0].shape[:2]
    if h % 2 or w % 2:
        raise ValueError(f"yuv420 contract needs even dims, got {h}x{w}")

    def wrapped(y, uv, *rest):
        x = yuv420_to_rgb(y, uv) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return fn(x, *rest)

    return wrapped, (jnp.zeros((h, w), jnp.uint8),
                     jnp.zeros((h // 2, w // 2, 2), jnp.uint8),
                     *example_args[1:])


_IMAGE_WRAPPERS = {"float32": None, "uint8": wrap_raw_image,
                   "yuv420": wrap_yuv420_image}


def export_forward(model, variables, image_size: Tuple[int, int],
                   num_objects: int, *,
                   platforms: Sequence[str] = ("tpu",),
                   pad_to: int = 16, raw_image: bool = True,
                   image_format: Optional[str] = None):
    """Lower the round-forward for `platforms` -> jax.export.Exported.

    image_format: 'uint8' (default — raw RGB frames, normalized
    device-side), 'float32' (pre-normalized; the graph
    `__graft_entry__.entry()` compile-checks), or 'yuv420' (the decoder's
    planar pair — see wrap_yuv420_image). `raw_image` is the legacy
    boolean spelling of uint8-vs-float32; image_format wins when given."""
    from jax import export as jex

    fmt = image_format or ("uint8" if raw_image else "float32")
    if fmt not in _IMAGE_WRAPPERS:
        raise ValueError(f"unknown image_format {fmt!r}")
    fn, example_args = build_round_forward(
        model, variables, image_size, num_objects, pad_to=pad_to)
    if _IMAGE_WRAPPERS[fmt] is not None:
        fn, example_args = _IMAGE_WRAPPERS[fmt](fn, example_args)
    checks = []
    if "tpu" in platforms:
        # Pallas matching kernels are tpu_custom_call custom calls.
        checks.append(jex.DisabledSafetyCheck.custom_call("tpu_custom_call"))
    return jex.export(jax.jit(fn), platforms=tuple(platforms),
                      disabled_checks=checks)(*example_args)


def _aval_json(avals) -> list:
    return [[list(a.shape), jnp.dtype(a.dtype).name] for a in avals]


def _merge_extra(manifest: Dict[str, Any],
                 extra: Optional[Dict[str, Any]]) -> None:
    """Merge caller metadata, refusing to clobber reserved keys (a
    clobbered 'format'/'entries'/... writes a file load_* cannot read)."""
    if not extra:
        return
    clash = sorted(set(extra) & set(manifest))
    if clash:
        raise ValueError(f"extra manifest keys collide with reserved "
                         f"keys: {clash}")
    manifest.update(extra)


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
    _merge_extra(manifest, extra)
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


# --------------------------------------------------------------------- #
# serving bundles (multiple named graphs in one file)
# --------------------------------------------------------------------- #

_BUNDLE_MAGIC = b"IVOSB1\n"
BUNDLE_FORMAT = "ivosx-bundle/1"


def export_serving_bundle(model, variables, image_size: Tuple[int, int],
                          num_objects: int, *,
                          platforms: Sequence[str] = ("tpu",),
                          pad_to: int = 16, raw_image: bool = True,
                          image_format: Optional[str] = None):
    """Lower every serving-loop stage -> {name: jax.export.Exported}.

    image_format ('uint8' default / 'float32' / 'yuv420') sets the
    `extract` entry's frame contract — see export_forward; raw_image is
    the legacy boolean spelling."""
    from jax import export as jex

    fmt = image_format or ("uint8" if raw_image else "float32")
    if fmt not in _IMAGE_WRAPPERS:
        raise ValueError(f"unknown image_format {fmt!r}")
    checks = []
    if "tpu" in platforms:
        checks.append(jex.DisabledSafetyCheck.custom_call("tpu_custom_call"))
    fns = build_serving_fns(model, variables, image_size, num_objects,
                            pad_to=pad_to)
    if _IMAGE_WRAPPERS[fmt] is not None:
        fns = dict(fns, extract=_IMAGE_WRAPPERS[fmt](*fns["extract"]))
    return {name: jex.export(jax.jit(fn), platforms=tuple(platforms),
                             disabled_checks=checks)(*args)
            for name, (fn, args) in fns.items()}


def save_bundle(exports: Dict[str, Any], path: str,
                extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Write named exports as one .ivosx bundle; returns the manifest."""
    names = sorted(exports)
    blobs = {n: exports[n].serialize() for n in names}
    manifest = {
        "format": BUNDLE_FORMAT,
        "jax_version": jax.__version__,
        "entries": {n: {
            "length": len(blobs[n]),
            "platforms": list(exports[n].platforms),
            "in_avals": _aval_json(exports[n].in_avals),
            "out_avals": _aval_json(exports[n].out_avals),
        } for n in names},
    }
    _merge_extra(manifest, extra)
    manifest = json.loads(json.dumps(manifest, sort_keys=True))
    with open(path, "wb") as f:
        f.write(_BUNDLE_MAGIC)
        f.write(json.dumps(manifest, sort_keys=True).encode() + b"\n")
        for n in names:                    # sorted-name order, concatenated
            f.write(blobs[n])
    return manifest


@dataclasses.dataclass(frozen=True)
class LoadedBundle:
    """A deserialized serving bundle: bundle['propagate'](*args)."""
    manifest: Dict[str, Any]
    _entries: Dict[str, Any]

    @property
    def names(self):
        return sorted(self._entries)

    def __getitem__(self, name: str) -> Callable:
        return self._entries[name].call


def load_bundle(path: str) -> LoadedBundle:
    with open(path, "rb") as f:
        magic = f.read(len(_BUNDLE_MAGIC))
        if magic != _BUNDLE_MAGIC:
            raise ValueError(
                f"{path}: not an {BUNDLE_FORMAT} bundle (bad magic "
                f"{magic!r})")
        try:
            manifest = json.loads(f.readline())
        except json.JSONDecodeError as e:
            raise ValueError(f"{path}: corrupt manifest: {e}") from e
        if manifest.get("format") != BUNDLE_FORMAT:
            raise ValueError(
                f"{path}: unsupported format {manifest.get('format')!r}")
        from jax import export as jex
        entries = {}
        for name in sorted(manifest["entries"]):
            blob = f.read(manifest["entries"][name]["length"])
            try:
                entries[name] = jex.deserialize(blob)
            except Exception as e:
                raise ValueError(
                    f"{path}: corrupt blob for entry {name!r}: {e}") from e
    return LoadedBundle(manifest=manifest, _entries=entries)
