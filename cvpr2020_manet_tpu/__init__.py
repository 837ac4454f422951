"""cvpr2020_manet_tpu — TPU-native interactive video object segmentation.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of MANet
(CVPR 2020, "Memory Aggregation Networks for Efficient Interactive Video
Object Segmentation", reference repo lightas/CVPR2020_MANet):

- shared pixel-embedding encoder (DeepLabV3+ / ResNet-101), run once per
  video, features cached in HBM                       (ref:networks/deeplab/)
- interaction branch: scribbles -> refreshed mask on the annotated frame
  plus a per-round interaction feature                (ref:networks/IntVOS.py int_seghead)
- propagation branch: per-object global/local pixel matching + decoder
  head, swept over all frames                         (ref:networks/IntVOS.py prop_seghead)
- memory aggregation: gated fusion of round interaction features and
  element-wise-min fusion of global matching maps     (ref:networks/IntVOS.py MA module)
- DAVIS interactive protocol: session loop, scribble robot, J&F metrics,
  AUC / J&F@60s report                                (external davisinteractive pkg)

All `ref:` citations are *expected* upstream paths; the reference mount was
empty during the survey (see SURVEY.md §0), so the blueprint of record is
SURVEY.md.
"""

__version__ = "0.1.0"
