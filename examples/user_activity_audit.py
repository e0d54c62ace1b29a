"""User-activity audit: the behavioral-health battery a team runs over an
event log before trusting per-user features or retention claims — is the
base growing or churning (growth accounting), which users are bots
(cadence dispersion + circadian concentration), who is about to leave
(dormancy depth), and does activity carry weekly structure worth modeling.

Every section is an engine operator (see COVERAGE.md), each individually
driver-oracled; this example composes them into the one-shot report a real
pipeline materializes next to its event lake. Per-user sections merge on
the driver — the frames are user-cardinality (audit-sized), the heavy
lifting happened inside the bucketed operators.

Run: python examples/user_activity_audit.py [events_parquet]
"""

import sys


def audit_users(events_path: str) -> dict:
    import ray.data

    from htrc_feature_reader_ray.stages.profile import (
        dow_chi2,
        hour_concentration,
        peak_hour_share,
    )
    from htrc_feature_reader_ray.stages.temporal import (
        activity_half_life,
        daily_autocorr,
        fano_factor,
        gap_stats,
        growth_accounting,
        max_silence,
    )

    def events(cols):
        return ray.data.read_parquet(events_path, columns=list(cols))

    ev = lambda: events(["user_id", "ts"])  # noqa: E731
    report = {}

    # 1. base health: daily new/retained/resurrected/churned + net
    report["daily_growth"] = (
        growth_accounting(ev()).to_pandas().sort_values("day")
        .reset_index(drop=True))

    # 2. per-user cadence: event-time dispersion (gap CV²), daily-grid
    # overdispersion (fano), day-to-day memory (autocorr), decay point
    # (half-life) — the four complementary burstiness axes
    cadence = gap_stats(ev(), key="user_id", ts="ts").to_pandas()
    for frame in (
        fano_factor(ev(), key="user_id", ts="ts").to_pandas()
        .drop(columns=["n_days", "n_events"]),
        daily_autocorr(ev(), key="user_id", ts="ts").to_pandas()
        .drop(columns=["n_days", "n_events"]),
        activity_half_life(ev(), key="user_id", ts="ts").to_pandas()
        .drop(columns=["n_days", "n_events"]),
    ):
        cadence = cadence.merge(frame, on="user_id", how="outer")
    report["user_cadence"] = cadence.sort_values("user_id").reset_index(
        drop=True)

    # 3. circadian/weekly shape: argmax hour + full-distribution HHI +
    # weekday χ² — the bot-vs-human fingerprint trio
    shape = peak_hour_share(ev(), key="user_id", ts="ts").to_pandas()
    shape = shape.merge(
        hour_concentration(ev(), key="user_id", ts="ts").to_pandas()
        .drop(columns=["n_events"]),
        on="user_id", how="outer")
    shape = shape.merge(
        dow_chi2(ev(), key="user_id", ts="ts").to_pandas()
        .drop(columns=["n_events"]),
        on="user_id", how="outer")
    report["weekly_shape"] = shape.sort_values("user_id").reset_index(
        drop=True)

    # 4. dormancy: deepest ENDED silence per user (winback targeting)
    report["dormancy"] = (
        max_silence(ev(), key="user_id", ts="ts").to_pandas()
        .sort_values("user_id").reset_index(drop=True))

    return report


def main(events_path: str) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    rep = audit_users(events_path)
    for name, frame in rep.items():
        print(f"== {name}: {len(frame)} rows ==")
        print(frame.head(5).to_string(index=False))
    ray.shutdown()


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    main(sys.argv[1] if len(sys.argv) > 1
         else "/root/testdata/sf0.001/events.parquet")
