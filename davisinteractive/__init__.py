"""Drop-in shim for the `davisinteractive` toolkit, backed by the
TPU-native framework in `cvpr2020_manet_tpu`.

The upstream reference (lightas/CVPR2020_MANet — SURVEY.md C20) is
written against the external ``davisinteractive`` PyPI package:

    from davisinteractive.session import DavisInteractiveSession
    from davisinteractive.utils.scribbles import scribbles2mask, \
        annotated_frames

This package makes that code run unmodified against our in-repo
implementation of the DAVIS interactive protocol
(`cvpr2020_manet_tpu.interactive.{session,scribbles,metrics,robot,
service}`). It is a THIN adapter: every function here delegates to the
framework module and only translates upstream argument names/orders
(e.g. upstream metrics take ``(y_true, y_pred)``; the framework takes
``(pred, gt, num_objects)``).

This is NOT the upstream package. `__is_manet_tpu_shim__` marks it so
callers (and future sessions) can detect shadowing if the real
davisinteractive ever becomes installable in this environment — the
semantics here were pinned from the protocol spec (SURVEY.md §0/§1)
and must be A/B-checked against the real package the day it appears.
"""

from davisinteractive.session import DavisInteractiveSession

__version__ = "0.0.0+manet-tpu-shim"
__is_manet_tpu_shim__ = True

__all__ = ["DavisInteractiveSession", "__version__",
           "__is_manet_tpu_shim__"]
