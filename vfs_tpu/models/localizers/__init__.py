"""Temporal action localizers.

``BMN`` regresses a boundary-matching confidence map over all
(start, duration) proposal pairs in one shot; ``TEM``/``PEM`` are the
two BSN stages (temporal evaluation producing start/end/action curves,
then proposal evaluation scoring sampled BSP features); ``SSN``
classifies and regresses staged temporal pools around each proposal.
"""

from .bmn import BMN
from .bsn import PEM, TEM
from .ssn import SSN

__all__ = ['BMN', 'PEM', 'TEM', 'SSN']
