"""Driver-row parity guard (VERDICT r3 item 7).

The driver's CORRECTNESS check verifies only the FIRST 50 entries of
``__spark_entry__.queries()`` in dict order (round-3 evidence:
CORRECTNESS_r03 keys == registry[0:50]).  These assertions make sure
future registry additions cannot silently push a crawl-native query out
of driver verification again, and that every query keeps a DuckDB
oracle twin.

No SparkSession needed — pure registry introspection, runs in <1s.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

DRIVER_CAP = 50

# The queries that must NEVER fall out of the driver's checked window:
# the crawl-native core (reference semantics under the hash gate) plus
# the six round-3 additions that slipped past slot 50 once already.
MUST_BE_CHECKED = [
    # crawl-native (reference parity)
    "frontier_schedule",  # RabbitThrottler wave hot path — crown jewel
    "status_filter",
    "word_count_top25",
    "crawl_stats",
    "url_kernel",
    "tpd_extract",
    "robots_eval",
    "provenance_cap",
    "dedup_exact",
    "dedup_first_wins",
    # round-3 additions that were ordered out of the r3 driver check
    "heavy_hitters",
    "pii_redact",
    "unigram_lm",
    "bigram_lm",
    "mix_sources",
]


def test_every_query_has_an_oracle():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(q) == set(o), (
        f"queries/oracle_sql key mismatch: only-queries={sorted(set(q) - set(o))} "
        f"only-oracle={sorted(set(o) - set(q))}"
    )


def test_crawl_native_queries_inside_driver_window():
    checked = list(entrymod.queries())[:DRIVER_CAP]
    missing = [k for k in MUST_BE_CHECKED if k not in checked]
    assert not missing, (
        f"crawl-native queries fell past the driver's first-{DRIVER_CAP} "
        f"CORRECTNESS window: {missing} — reorder queries() in "
        f"__spark_entry__.py (see the ORDER MATTERS comment)"
    )


def test_frontier_schedule_leads():
    # the single most crawl-native query sits in the first 5 slots so a
    # few additions above it can never push it out
    assert "frontier_schedule" in list(entrymod.queries())[:5]


def test_queries_and_oracles_are_callable_and_nonempty():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())
