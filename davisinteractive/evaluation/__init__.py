"""`davisinteractive.evaluation` — evaluation service (upstream:
davisinteractive/evaluation/service.py).

The framework's HTTP evaluation server plays upstream's remote-service
role: ground truth, robot, and the clock live server-side; clients talk
to it through `DavisInteractiveSession(host='http://...')`. See
`cvpr2020_manet_tpu/interactive/service.py`.
"""

from davisinteractive.evaluation import service

__all__ = ["service"]
