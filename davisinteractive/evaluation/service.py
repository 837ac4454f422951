"""`davisinteractive.evaluation.service` — re-export of the framework's
evaluation server (`cvpr2020_manet_tpu.interactive.service`): an
in-repo stdlib-HTTP equivalent of upstream's hosted challenge service.
`serve(dataset, ...)` starts one; `EvaluationService` is the scoring
core shared by the local and remote session modes."""

from cvpr2020_manet_tpu.interactive.service import (
    EvaluationService, RemoteSession, serve)

__all__ = ["EvaluationService", "RemoteSession", "serve"]
