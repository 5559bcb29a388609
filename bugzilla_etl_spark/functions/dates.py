"""Date reformatting (P10): parse_bug_history.js:447-473 semantics.

- slash-datetime ``2012/01/01 00:00:00.000`` (deadline, cf_due_date)
  -> ``2012-01-01``;
- strict-pattern datetime (cf_last_resolved) -> epoch-ms string;
- empty string -> None (ES date-field safety: an empty string would
  poison a date-typed field, js:463-466).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

SLASH_DATE_RE = re.compile(r"^(\d{4})/(\d{2})/(\d{2})(?:\s.*)?$")
STRICT_DT_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$")

DATE_FIELDS = {"deadline", "cf_due_date"}
EPOCH_FIELDS = {"cf_last_resolved"}


def fix_date_value(field: str, value):
    """Python-side normalizer used inside the replay UDF."""
    if value is None:
        return None
    if value == "":
        return None if (field in DATE_FIELDS or field in EPOCH_FIELDS) else value
    if field in DATE_FIELDS:
        m = SLASH_DATE_RE.match(value)
        if m:
            return f"{m.group(1)}-{m.group(2)}-{m.group(3)}"
        return value
    if field in EPOCH_FIELDS and STRICT_DT_RE.match(value):
        dt = datetime.strptime(value, "%Y-%m-%d %H:%M:%S").replace(
            tzinfo=timezone.utc
        )
        return str(int(dt.timestamp() * 1000))
    return value
