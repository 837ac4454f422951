"""Int8 matching backend through the SERVING engines (round-5 threading).

The kernel-level int8 contract (exact on dequantized embeddings,
segmented==monolithic, Evaluator path) is pinned in
tests/test_pallas_matching.py and tests/test_evaluator.py. These tests
pin the round-5 threading of the backend through the OTHER two serving
engines — StreamingIVOS and BatchPropagator — which route matching via
the model's backend switch (models/manet.py _global_matching), so
constructing the model with matching_backend="pallas_int8" is the whole
integration. Parity bar: int8 differs from f32 only by embedding
quantization, so argmax masks must agree on nearly all pixels (the
measured entry-task quality delta lives in docs/QUALITY.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.data import SyntheticDataset
from cvpr2020_manet_tpu.models import MANet


def _init(cfg, model):
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    return jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)),
        jnp.zeros((1, h // 4, w // 4, o)))


def _agreement(a, b):
    return float((np.asarray(a) == np.asarray(b)).mean())


def test_streaming_int8_backend_parity():
    from cvpr2020_manet_tpu.engine.streaming import StreamingIVOS
    from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot

    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    ds = SyntheticDataset(image_size=(h, w), num_frames=4,
                          num_sequences=1, num_objects=1)
    seq = ds.sequences()[0]
    images, gt = ds.images(seq), ds.gt_masks(seq)
    robot = InteractiveScribblesRobot()

    masks = {}
    for backend in ("pallas_interpret", "pallas_int8_interpret"):
        model = MANet(cfg.model, matching_backend=backend)
        variables = _init(cfg, model)
        s = StreamingIVOS(cfg, model, variables)
        s.reset(num_objects=1)
        s.observe(images[0])
        scr = robot.scribble_frame(np.zeros_like(gt[0]), gt[0], 1, 0, 1,
                                   seq)
        s.correct(scr.to_json())
        masks[backend] = [np.asarray(s.observe(images[t]))
                          for t in (1, 2, 3)]

    for t, (m_f32, m_i8) in enumerate(zip(masks["pallas_interpret"],
                                          masks["pallas_int8_interpret"])):
        assert _agreement(m_f32, m_i8) > 0.97, f"frame {t + 1}"


def test_batch_propagator_int8_backend_parity():
    from cvpr2020_manet_tpu.engine.propagate_batch import BatchPropagator

    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    b, t = 2, 3
    frames = np.zeros((b, t, h, w, 3), np.uint8)
    firsts = []
    for i in range(b):
        ds = SyntheticDataset(image_size=(h, w), num_frames=t,
                              num_sequences=1, num_objects=2, seed=i)
        seq = ds.sequences()[0]
        frames[i] = (np.clip(ds.images(seq), 0, 1) * 255).astype(np.uint8)
        firsts.append(ds.gt_masks(seq)[0, ::4, ::4])
    first = np.stack(firsts).astype(np.int32)
    nobj = np.array([2, 2])

    outs = {}
    for backend in ("pallas_interpret", "pallas_int8_interpret"):
        model = MANet(cfg.model, matching_backend=backend)
        variables = _init(cfg, model)
        prop = BatchPropagator(cfg, model, variables)
        outs[backend] = np.asarray(prop.propagate(frames, first, nobj))

    assert outs["pallas_int8_interpret"].shape == (b, t, h, w)
    assert _agreement(outs["pallas_interpret"],
                      outs["pallas_int8_interpret"]) > 0.97
