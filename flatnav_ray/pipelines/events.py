"""Driver-gate pipelines over the events table (tumbling windows,
sessionization) — see stages/events.py for the operator designs."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..stages.events import hopping_counts, sessionize, windowed_counts


def _events(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )


def events_windowed(sf_dir: str) -> pa.Table:
    """Per (1-hour tumbling window, event_type): count + exact integer-cents
    value sum. Map-side combined; only (window, type) partials shuffle."""
    return windowed_counts(_events(sf_dir))


def events_hopping(sf_dir: str) -> pa.Table:
    """Per (1-hour window hopping every 30 min, event_type): count + exact
    integer-cents sum — each event lands in 2 overlapping windows. The
    2x fan-out is absorbed by the per-batch combine; only (window, type)
    partials shuffle (stages/events.hopping_counts)."""
    return hopping_counts(_events(sf_dir))


def events_sessions(sf_dir: str) -> pa.Table:
    """Gap-based (30 min) sessionization per user; session_seq is the 0-based
    session index within the user."""
    return sessionize(_events(sf_dir))


def events_range_join(sf_dir: str) -> pa.Table:
    """Band join: (click, purchase) pairs of the same user with the purchase
    in [click.ts, click.ts + 30 min) — window attribution."""
    from ..stages.relational import range_join_window

    return range_join_window(
        _events(sf_dir), left_type="click", right_type="purchase",
        window_us=30 * 60 * 1_000_000,
    )


def events_asof(sf_dir: str) -> pa.Table:
    """As-of join: each purchase matched to the user's most recent prior
    click (strict (ts, event_id) order; -1 when none)."""
    from ..stages.relational import asof_join_prior

    return asof_join_prior(_events(sf_dir), left_type="purchase", right_type="click")
