"""S4 — engine configuration mirroring the reference's
config/config.properties keys (src/main/resources/config/config.properties:1-18).

Plain dict + env overrides; the achievement thresholds become the
literal threshold tuple used by operators.thresholds (a broadcastable
dimension at scale).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _thresholds_from(s: str) -> tuple[int, ...]:
    return tuple(int(x) for x in s.split(",") if x.strip())


@dataclass(frozen=True)
class EngineConfig:
    # kafka (config.properties:1-8)
    bootstrap_servers: str = "localhost:9092"
    raw_events_topic: str = "topic_logged_events"
    anonymous_events_topic: str = "topic_anonymous_logged_events"
    # intended derived-stream chain (config.properties:10-14)
    derived_streams: tuple[str, ...] = (
        "loggedEvents",
        "questionPartAttempts",
        "completedQuestions",
        "userAchievements",
        "userNotifications",
    )
    # achievements (config.properties:17)
    achievement_thresholds: tuple[int, ...] = (1, 5, 10, 20, 30, 50, 75, 100)
    # postgres (PostgresSqlDb.java)
    jdbc_url: str = ""
    jdbc_properties: dict = field(default_factory=dict)
    # streaming cadence (LoggedEventsListener.java:72)
    trigger_interval: str = "10 seconds"


def from_env(prefix: str = "ISAAC_") -> EngineConfig:
    env = os.environ
    kwargs: dict = {}
    if f"{prefix}BOOTSTRAP_SERVERS" in env:
        kwargs["bootstrap_servers"] = env[f"{prefix}BOOTSTRAP_SERVERS"]
    if f"{prefix}THRESHOLDS" in env:
        kwargs["achievement_thresholds"] = _thresholds_from(
            env[f"{prefix}THRESHOLDS"]
        )
    if f"{prefix}JDBC_URL" in env:
        kwargs["jdbc_url"] = env[f"{prefix}JDBC_URL"]
    if f"{prefix}TRIGGER_INTERVAL" in env:
        kwargs["trigger_interval"] = env[f"{prefix}TRIGGER_INTERVAL"]
    return EngineConfig(**kwargs)
