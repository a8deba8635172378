"""Notification channel config and user subscriptions — the data
side of the reference's ``!fb setup`` / ``!fb subscribe`` commands
(/root/reference/discord_integration.py:303-330).

The reference keeps both in in-process dicts
(``self.notification_channels``, ``self.user_subscriptions``) — they
vanish on restart. Here they are keyed tables with the same
semantics (last write wins per key, same validation sets, 'all'
wildcard), durable through the standard upsert operators, plus the
routing joins the reference performs inline in its alert loop
(discord_integration.py:469-530): which channel receives an alert
type for each guild, and which users subscribed to a category.

Scale is trivial (config tables are guild/user-sized); the point is
surface parity — a reference user migrating their bot keeps the
exact setup/subscribe/route behavior, persisted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.upsert import upsert_replace

#: discord_integration.py:309 — valid_types
VALID_ALERT_TYPES = frozenset({"odds", "injuries", "previews"})
#: discord_integration.py:321 — valid_prefs
VALID_PREFS = frozenset({"injuries", "odds", "games", "all"})

CHANNELS_SCHEMA = "guild_id long, alert_type string, channel_id long, updated_at timestamp"
SUBS_SCHEMA = "user_id long, pref string, updated_at timestamp"


def set_channel(channels: DataFrame, delta: DataFrame) -> DataFrame:
    """``!fb setup <alert_type>``: route ``alert_type`` for a guild
    to a channel — keyed (guild_id, alert_type), last write wins
    (the reference's dict assignment). Invalid alert types fail
    loudly with the same valid-set message the bot replies with."""
    # NULL-safe: ~isin(NULL) is NULL and would silently skip the
    # filter, persisting an unroutable NULL-keyed row
    bad = delta.filter(
        ~F.col("alert_type").isin(*VALID_ALERT_TYPES)
        | F.col("alert_type").isNull()
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"Please specify alert type: {'/'.join(sorted(VALID_ALERT_TYPES))}"
        )
    # channel_id as the final tie-break: two setups for one key in
    # the same second resolve deterministically (max channel_id) —
    # a set-based batch has no notion of the reference's sequential
    # "last command wins", so the tie rule is pinned instead
    return upsert_replace(
        channels,
        delta,
        keys=["guild_id", "alert_type"],
        order_cols=["updated_at", "channel_id"],
    )


def set_subscription(subs: DataFrame, delta: DataFrame) -> DataFrame:
    """``!fb subscribe [prefs...]``: replace the user's whole
    preference set (the reference assigns the list wholesale, so the
    upsert first drops the user's previous rows — one row per pref
    here, relational form of the dict's list value)."""
    bad = delta.filter(
        ~F.col("pref").isin(*VALID_PREFS) | F.col("pref").isNull()
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"Valid preferences: {', '.join(sorted(VALID_PREFS))}"
        )
    survivors = subs.join(delta.select("user_id").distinct(), "user_id", "left_anti")
    # '!fb subscribe odds odds' must store one row, like the
    # reference's set(preferences)
    return survivors.unionByName(delta.dropDuplicates(["user_id", "pref"]))


def channels_for(channels: DataFrame, alert_type: str) -> DataFrame:
    """Routing half 1 (discord_integration.py:469-530): the channel
    per guild configured for this alert type."""
    return channels.filter(F.col("alert_type") == alert_type).select(
        "guild_id", "channel_id"
    )


def subscribers_for(subs: DataFrame, category: str) -> DataFrame:
    """Routing half 2: users subscribed to ``category`` — 'all' is
    the wildcard pref, exactly the reference's membership check."""
    return (
        subs.filter(F.col("pref").isin(category, "all"))
        .select("user_id")
        .distinct()
    )
