"""Streaming serving mode (BASELINE config 5) on the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.data import SyntheticDataset
from cvpr2020_manet_tpu.engine.streaming import StreamingIVOS
from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot
from cvpr2020_manet_tpu.models import MANet


def test_streaming_observe_correct_loop():
    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    ds = SyntheticDataset(image_size=(h, w), num_frames=4,
                          num_sequences=1, num_objects=1)
    seq = ds.sequences()[0]
    images, gt = ds.images(seq), ds.gt_masks(seq)

    model = MANet(cfg.model, matching_backend="jnp")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))
    s = StreamingIVOS(cfg, model, variables)
    s.reset(num_objects=1)

    # frame 0: no memory yet -> all background
    m0 = s.observe(images[0])
    assert m0.shape == (h, w)
    assert (m0 == 0).all()

    # user corrects frame 0
    robot = InteractiveScribblesRobot()
    scr = robot.scribble_frame(np.zeros_like(gt[0]), gt[0], 1, 0, 1, seq)
    m0c = s.correct(scr.to_json())
    assert m0c.shape == (h, w)
    assert int(s.state["rounds"]) == 1
    # memory page written
    assert float(jnp.abs(s.state["mem_emb"]).sum()) > 0

    # subsequent frames are segmented against the memory
    m1 = s.observe(images[1])
    m2 = s.observe(images[2])
    assert m1.shape == (h, w) and m2.shape == (h, w)
    assert m1.max() <= cfg.model.max_objects

    # a second correction appends another page, not overwriting the first
    scr2 = robot.scribble_frame(m2, gt[2], 1, 2, 3, seq)
    if scr2.scribbles[2]:
        s.correct(scr2.to_json())
        assert int(s.state["rounds"]) == 2


def test_streaming_live_pages_and_async():
    """Live-page matching slices to the filled power-of-2 page bucket;
    observe_async returns the SAME masks as sync observe; masks are
    unaffected by how much dead capacity sits beyond the live pages."""
    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    ds = SyntheticDataset(image_size=(h, w), num_frames=6,
                          num_sequences=1, num_objects=1)
    seq = ds.sequences()[0]
    images, gt = ds.images(seq), ds.gt_masks(seq)
    model = MANet(cfg.model, matching_backend="jnp")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))
    robot = InteractiveScribblesRobot()

    s = StreamingIVOS(cfg, model, variables)
    s.reset(num_objects=1)
    assert s.live_pages() == 1           # empty memory still matches 1 page
    s.observe(images[0])
    scr = robot.scribble_frame(np.zeros_like(gt[0]), gt[0], 1, 0, 1, seq)
    s.correct(scr.to_json())
    assert s.live_pages() == 1
    m_sync = s.observe(images[1])
    s.correct(scr.to_json())             # second page
    assert s.live_pages() == 2
    s.correct(scr.to_json())             # third -> bucket 4
    assert s.live_pages() == 4

    # async path: fresh engine, same sequence of calls, same masks
    s2 = StreamingIVOS(cfg, model, variables)
    s2.reset(num_objects=1)
    s2.observe_async(images[0]).result()
    s2.correct(scr.to_json())
    m_async = s2.observe_async(images[1]).result()
    np.testing.assert_array_equal(m_sync, m_async)

    # context-parallel path: live pages sharded over 'context',
    # all-gather-min combine — identical masks to single-device
    from cvpr2020_manet_tpu.parallel.mesh import create_mesh
    s3 = StreamingIVOS(cfg, model, variables,
                       cp_mesh=create_mesh(data=2, context=4))
    s3.reset(num_objects=1)
    s3.observe(images[0])
    s3.correct(scr.to_json())
    m_cp = s3.observe(images[1])
    np.testing.assert_array_equal(m_sync, m_cp)

    # reset() to a DIFFERENT object count reuses the same traced shapes
    # but a different mask bit depth — the packed/unpacked widths must
    # stay consistent (regression: stale bits baked into the cached
    # trace produced wrong-width masks)
    s4 = StreamingIVOS(cfg, model, variables)
    s4.reset(num_objects=1)
    s4.observe(images[0])
    assert s4._bits == 1
    s4.reset(num_objects=2)
    assert s4._bits == 2
    m_re = s4.observe(images[0])
    assert m_re.shape == (h, w)
    assert (m_re == 0).all()        # fresh state: all background
    ds2 = SyntheticDataset(image_size=(h, w), num_frames=2,
                           num_sequences=1, num_objects=2)
    seq2 = ds2.sequences()[0]
    gt2 = ds2.gt_masks(seq2)
    scr2 = robot.scribble_frame(np.zeros_like(gt2[0]), gt2[0], 2, 0, 1,
                                seq2)
    m_c = s4.correct(scr2.to_json())
    assert m_c.shape == (h, w) and m_c.max() <= 2

    # a future still pending across reset() decodes at the bits it was
    # PACKED with, not the post-reset depth (regression: _unpack read
    # self._bits at drain time)
    s5 = StreamingIVOS(cfg, model, variables)
    s5.reset(num_objects=1)
    ref = s5.observe(images[0])
    s5.reset(num_objects=1)
    fut = s5.observe_async(images[0])       # packed at 1 bit/px
    s5.reset(num_objects=2)                 # stream re-keyed to 2 bits
    np.testing.assert_array_equal(fut.result(), ref)


def test_streaming_yuv420_ingest():
    """observe()/observe_async() accept the decoder's planar (y, uv)
    pair: round 0 (no memory) is deterministic background regardless of
    colorspace; after a correction the stream keeps producing valid
    labels through the same jit caches."""
    from cvpr2020_manet_tpu.utils.ingest import rgb_to_yuv420_host

    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    ds = SyntheticDataset(image_size=(h, w), num_frames=3,
                          num_sequences=1, num_objects=1)
    seq = ds.sequences()[0]
    images, gt = ds.images(seq), ds.gt_masks(seq)
    frames_u8 = (np.clip(images, 0, 1) * 255).astype(np.uint8)

    model = MANet(cfg.model, matching_backend="jnp")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))
    s = StreamingIVOS(cfg, model, variables)
    s.reset(num_objects=1)

    y0, uv0 = rgb_to_yuv420_host(frames_u8[0])
    m0 = s.observe((y0, uv0))
    assert m0.shape == (h, w)
    assert (m0 == 0).all()           # no memory -> background, exactly

    robot = InteractiveScribblesRobot()
    scr = robot.scribble_frame(np.zeros_like(gt[0]), gt[0], 1, 0, 1, seq)
    s.correct(scr.to_json())
    m1 = s.observe(rgb_to_yuv420_host(frames_u8[1]))
    assert m1.shape == (h, w)
    assert 0 <= m1.min() and m1.max() <= cfg.model.max_objects
    # mixed ingest on one stream: the rgb path still works after yuv
    m2 = s.observe(frames_u8[2])
    assert m2.shape == (h, w)
