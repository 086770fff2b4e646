"""Calendar-aware date deltas.  The reference vendors a copy of
dateutil's relativedelta (support/relativedelta.py); dateutil ships in
this environment (pandas dependency), so the real class is re-exported
— same API, same semantics, no vendored fork to drift.

``search/dateparse.py`` uses the same import, so plusdate arithmetic
("+1mo3d") and date-range gaps go through this exact class.
"""

from dateutil.relativedelta import MO, TU, WE, TH, FR, SA, SU  # noqa: F401
from dateutil.relativedelta import relativedelta, weekday  # noqa: F401
