"""`davisinteractive.session` — session entry point (upstream:
davisinteractive/session/session.py; SURVEY.md C20, §4.1).

`DavisInteractiveSession` is re-exported from the framework, whose
constructor already mirrors the upstream signature (`host`, `key`,
`davis_root`, `subset`, `max_nb_interactions`, `max_time`,
`metric_to_optimize`) — `http(s)://` hosts route to the remote
evaluation service, anything else runs the in-process local service.
"""

from cvpr2020_manet_tpu.interactive.session import DavisInteractiveSession

__all__ = ["DavisInteractiveSession"]
