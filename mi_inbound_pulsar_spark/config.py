"""Typed source configuration — the Spark-side replacement for the
reference's stringly-typed ``Properties`` → POJO parsing.

Reference surface being re-expressed (see SURVEY.md §2A C1-C6, S1-S5,
S12, K7):

- ``PulsarUtils.getConnectionConfigFromProperties``
  (PulsarUtils.java:77-114) and the per-field parsers in
  ``PulsarConnectionConfig.java:36-296`` — here one validated
  dataclass replaces ~330 LoC of boilerplate.
- Validation parity:
  * mandatory serviceUrl (PulsarConnectionConfig.java:36-43 / C5)
  * topics XOR topicsPattern required (PulsarMessageConsumer.java:259-261 / S3)
  * TLS inferred from the serviceUrl scheme (ConnectionConfiguration.java:25-34 / C3)
  * batch receive needs ≥1 bound (PulsarMessageConsumer.java:307-309 / S12)
  * auth dispatch: NONE / JWT real, OAUTH2 and TLS rejected as
    unsupported — they are empty stubs in the reference
    (PulsarUtils.java:90-111 / C4)
- Enum parity: SubscriptionType (PulsarMessageConsumer.java:378-386),
  SubscriptionInitialPosition (:389-397), RegexSubscriptionMode
  (:368-376).

``to_reader_options()`` flattens everything into the option dict a
``spark.readStream.format("pulsar")`` connector (e.g. the public
StreamNative pulsar-spark connector) accepts; the file-backed simulator
(sources/pulsar_source.py) consumes the same config, so swapping in a
live broker is a one-line change.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum


class SubscriptionType(Enum):
    EXCLUSIVE = "Exclusive"
    SHARED = "Shared"
    FAILOVER = "Failover"
    KEY_SHARED = "Key_Shared"


class SubscriptionInitialPosition(Enum):
    LATEST = "Latest"
    EARLIEST = "Earliest"


class RegexSubscriptionMode(Enum):
    ALL_TOPICS = "AllTopics"
    PERSISTENT_ONLY = "PersistentOnly"
    NON_PERSISTENT_ONLY = "NonPersistentOnly"


class AuthType(Enum):
    NONE = "NONE"
    JWT = "JWT"


class PulsarConfigError(ValueError):
    """Config-time failure; mirrors the reference's SynapseException-at-parse
    behavior (PulsarMessageConsumer.java:373,383,394)."""


def _parse_enum(enum_cls, raw: str, what: str):
    for member in enum_cls:
        if member.value.lower() == raw.strip().lower():
            return member
    valid = ", ".join(m.value for m in enum_cls)
    raise PulsarConfigError(f"invalid {what} {raw!r}; expected one of: {valid}")


@dataclass(frozen=True)
class BatchReceivePolicy:
    """S12 — bounds for one micro-batch; ≥1 bound must be set
    (PulsarMessageConsumer.java:306-324)."""

    max_num_messages: int | None = None
    max_num_bytes: int | None = None
    timeout_ms: int | None = None

    def __post_init__(self) -> None:
        if self.max_num_messages is None and self.max_num_bytes is None and self.timeout_ms is None:
            raise PulsarConfigError(
                "batch receive requires at least one of maxNumMessages/maxNumBytes/timeoutMs"
            )


@dataclass(frozen=True)
class DeadLetterPolicy:
    """K7 — route to DLQ after max_redeliveries; default 5
    (PulsarMessageConsumer.java:296-298, uischema.json:792)."""

    max_redeliveries: int = 5
    dlq_topic: str | None = None


@dataclass(frozen=True)
class PulsarSourceConfig:
    service_url: str = ""
    topics: list[str] = field(default_factory=list)
    topics_pattern: str | None = None
    regex_subscription_mode: RegexSubscriptionMode = RegexSubscriptionMode.PERSISTENT_ONLY
    subscription_name: str = "spark-sub"
    subscription_type: SubscriptionType = SubscriptionType.EXCLUSIVE
    initial_position: SubscriptionInitialPosition = SubscriptionInitialPosition.LATEST
    consumer_name: str | None = None
    content_type: str | None = None
    poll_interval_ms: int = 100  # reference default, uischema.json:91-96
    batch_policy: BatchReceivePolicy | None = None
    dlq: DeadLetterPolicy = field(default_factory=DeadLetterPolicy)
    nack_redelivery_delay_ms: int | None = None
    ack_timeout_ms: int | None = None
    receiver_queue_size: int | None = None
    read_compacted: bool = False
    auth_type: AuthType = AuthType.NONE
    jwt_token: str | None = None
    use_tls: bool | None = None
    client_options: dict[str, str] = field(default_factory=dict)  # C1 loadConf passthrough

    def __post_init__(self) -> None:
        # C5: mandatory serviceUrl (PulsarConnectionConfig.java:36-43)
        if not self.service_url:
            raise PulsarConfigError("serviceUrl is mandatory and cannot be empty")
        # S3: topics XOR pattern (PulsarMessageConsumer.java:259-261)
        if not self.topics and not self.topics_pattern:
            raise PulsarConfigError("either topicNames or topicsPattern must be provided")
        if self.topics_pattern is not None:
            try:
                re.compile(self.topics_pattern)
            except re.error as exc:
                raise PulsarConfigError(f"invalid topicsPattern: {exc}") from exc
        # C4: JWT needs a token; OAuth2/TLS auth are reference stubs → rejected upstream
        if self.auth_type is AuthType.JWT and not self.jwt_token:
            raise PulsarConfigError("JWT auth requires a token")
        if self.dlq.max_redeliveries < 0:
            raise PulsarConfigError("dlqMaxRedeliverCount must be >= 0")

    @property
    def tls_enabled(self) -> bool:
        """C3 — TLS inferred from the URL scheme, explicit flag as fallback
        (ConnectionConfiguration.java:25-34)."""
        url = self.service_url.lower()
        if url.startswith(("pulsar+ssl://", "https://")):
            return True
        if url.startswith(("pulsar://", "http://")):
            return False
        return bool(self.use_tls)

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> PulsarSourceConfig:
        """Parse a flat string-keyed dict using the reference's property
        names (PulsarConstants.java) into the typed config."""
        topics_raw = props.get("topicNames", "")
        # S1: split on "," (PulsarMessageConsumer.java:249-251,363)
        topics = [t.strip() for t in topics_raw.split(",") if t.strip()] if topics_raw else []
        batch = None
        if props.get("batchingEnabled", "true").lower() == "true" and (
            "batchingMaxMessages" in props or "batchingMaxBytes" in props or "batchingTimeout" in props
        ):
            batch = BatchReceivePolicy(
                max_num_messages=_opt_int(props, "batchingMaxMessages"),
                max_num_bytes=_opt_int(props, "batchingMaxBytes"),
                timeout_ms=_opt_int(props, "batchingTimeout"),
            )
        auth_raw = props.get("authorizationType", "NONE").upper()
        if auth_raw in ("OAUTH2", "TLS"):
            # C4: unsupported stubs in the reference (PulsarUtils.java:99-104)
            raise PulsarConfigError(f"auth type {auth_raw} is not supported (reference stub)")
        if auth_raw not in AuthType.__members__:
            raise PulsarConfigError(f"unknown authorizationType {auth_raw!r}")
        return cls(
            service_url=props.get("serviceUrl", ""),
            topics=topics,
            topics_pattern=props.get("topicsPattern"),
            regex_subscription_mode=_parse_enum(
                RegexSubscriptionMode,
                props.get("subscriptionTopicsMode", "PersistentOnly"),
                "subscriptionTopicsMode",
            ),
            subscription_name=props.get("subscriptionName", "spark-sub"),
            subscription_type=_parse_enum(
                SubscriptionType, props.get("subscriptionType", "Exclusive"), "subscriptionType"
            ),
            initial_position=_parse_enum(
                SubscriptionInitialPosition,
                props.get("subscriptionInitialPosition", "Latest"),
                "subscriptionInitialPosition",
            ),
            consumer_name=props.get("consumerName"),
            content_type=props.get("contentType"),
            poll_interval_ms=int(props.get("interval", "100")),
            batch_policy=batch,
            dlq=DeadLetterPolicy(
                max_redeliveries=int(props.get("dlqMaxRedeliverCount", "5")),
                dlq_topic=props.get("dlqTopic"),
            ),
            nack_redelivery_delay_ms=_opt_int(props, "nackRedeliveryDelay"),
            ack_timeout_ms=_opt_int(props, "ackTimeoutMillis"),
            receiver_queue_size=_opt_int(props, "receiverQueueSize"),
            read_compacted=props.get("readCompacted", "false").lower() == "true",
            auth_type=AuthType[auth_raw],
            jwt_token=props.get("token"),
            use_tls=(props.get("useTLS", "").lower() == "true") if "useTLS" in props else None,
            client_options={
                k: v for k, v in props.items() if k.startswith("pulsar.client.")
            },
        )

    def to_reader_options(self) -> dict[str, str]:
        """Options for a real pulsar-spark connector source."""
        opts: dict[str, str] = {
            "service.url": self.service_url,
            "predefinedSubscription": self.subscription_name,
            "startingOffsets": "latest"
            if self.initial_position is SubscriptionInitialPosition.LATEST
            else "earliest",
        }
        if self.topics:
            opts["topics"] = ",".join(self.topics)
        if self.topics_pattern:
            opts["topicsPattern"] = self.topics_pattern
        if self.batch_policy and self.batch_policy.max_num_messages:
            opts["maxEntriesPerTrigger"] = str(self.batch_policy.max_num_messages)
        if self.auth_type is AuthType.JWT:
            opts["pulsar.client.authPluginClassName"] = (
                "org.apache.pulsar.client.impl.auth.AuthenticationToken"
            )
            opts["pulsar.client.authParams"] = f"token:{self.jwt_token}"
        if self.tls_enabled:
            opts["pulsar.client.useTls"] = "true"
        opts.update(self.client_options)
        return opts


def _opt_int(props: dict[str, str], key: str) -> int | None:
    """Optional numeric parse. The reference NPE-unboxes absent values
    (PulsarMessageConsumer.java:329,333,354) — we return None instead."""
    raw = props.get(key)
    return int(raw) if raw is not None and raw != "" else None
