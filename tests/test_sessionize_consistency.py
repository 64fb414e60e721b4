"""Cross-validation: the gaps-and-islands batch sessionization
(events_sessionize) and the session_window path (stream_session_10m) must
describe the SAME sessions — same per-user session count, same event-count
multiset per user. Two independent renderings of one semantic; agreement is
evidence neither has an off-by-one in its gap rule (session_window closes a
session when the inter-event gap is >= 10 min and the events at hand carry
microsecond-unique timestamps per user, so the boundary case never splits
them).
"""

from __future__ import annotations

from collections import Counter

from gridmr_spark.queries import load_all

REG = load_all()


def _by_user_sessions(rows, user_key, n_key):
    out: dict[int, Counter] = {}
    for r in rows:
        out.setdefault(r[user_key], Counter())[r[n_key]] += 1
    return out


def test_sessionize_matches_session_window(spark, sf_oracle):
    batch = REG["events_sessionize"].fn(spark, sf_oracle).collect()
    stream = REG["stream_session_10m"].fn(spark, sf_oracle).collect()
    assert _by_user_sessions(batch, "user_id", "n_events") == _by_user_sessions(
        stream, "user_id", "n_events"
    )
