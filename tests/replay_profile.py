"""Shared hypothesis settings for the replay-property suites.

The default budget per property is small (5-10 examples): enough to
re-run persisted falsifying examples and keep the full suite's wall
time bounded.  Set REPLAY_DEEP=<n> to raise every suite's budget to at
least n for a discovery campaign — the round-6 campaign caught five
real bugs at max_examples<=10, so the search is productive and worth
running deep once per round before committing.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, settings


def replay_settings(max_examples: int) -> settings:
    deep = os.environ.get("REPLAY_DEEP")
    if deep:
        max_examples = max(int(deep), max_examples)
    return settings(
        max_examples=max_examples,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
