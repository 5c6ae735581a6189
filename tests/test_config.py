"""Config validation parity with the reference (SURVEY.md §2A C1-C6, S3).

Each case mirrors a documented reference behavior; citations in
mi_inbound_pulsar_spark/config.py docstrings.
"""

from __future__ import annotations

import pytest

from mi_inbound_pulsar_spark.config import (
    AuthType,
    BatchReceivePolicy,
    PulsarConfigError,
    PulsarSourceConfig,
    SubscriptionInitialPosition,
    SubscriptionType,
)


def test_service_url_mandatory():
    # C5 — PulsarConnectionConfig.java:36-43
    with pytest.raises(PulsarConfigError, match="serviceUrl"):
        PulsarSourceConfig(service_url="", topics=["t"])


def test_topics_xor_pattern_required():
    # S3 — PulsarMessageConsumer.java:259-261
    with pytest.raises(PulsarConfigError, match="topicNames or topicsPattern"):
        PulsarSourceConfig(service_url="pulsar://h:6650")


def test_invalid_pattern_rejected():
    with pytest.raises(PulsarConfigError, match="topicsPattern"):
        PulsarSourceConfig(service_url="pulsar://h:6650", topics_pattern="([")


def test_jwt_requires_token():
    with pytest.raises(PulsarConfigError, match="JWT"):
        PulsarSourceConfig(service_url="pulsar://h:6650", topics=["t"], auth_type=AuthType.JWT)


def test_batch_policy_needs_one_bound():
    # S12 — PulsarMessageConsumer.java:307-309
    with pytest.raises(PulsarConfigError, match="at least one"):
        BatchReceivePolicy()
    BatchReceivePolicy(max_num_messages=100)  # ok


@pytest.mark.parametrize(
    ("url", "flag", "expected"),
    [
        ("pulsar+ssl://h:6651", None, True),
        ("https://h:443", None, True),
        ("pulsar://h:6650", None, False),
        ("http://h:80", None, False),
        ("unknown-scheme://h", True, True),
        ("unknown-scheme://h", None, False),
    ],
)
def test_tls_inference_from_url(url, flag, expected):
    # C3 — ConnectionConfiguration.java:25-34
    cfg = PulsarSourceConfig(service_url=url, topics=["t"], use_tls=flag)
    assert cfg.tls_enabled is expected


def test_oauth2_and_tls_auth_rejected_as_stubs():
    # C4 — PulsarUtils.java:99-104 (empty stubs in the reference)
    for auth in ("OAUTH2", "TLS"):
        with pytest.raises(PulsarConfigError, match="not supported"):
            PulsarSourceConfig.from_properties(
                {"serviceUrl": "pulsar://h:6650", "topicNames": "t", "authorizationType": auth}
            )


def test_unknown_auth_rejected():
    with pytest.raises(PulsarConfigError, match="unknown authorizationType"):
        PulsarSourceConfig.from_properties(
            {"serviceUrl": "pulsar://h:6650", "topicNames": "t", "authorizationType": "KERBEROS"}
        )


def test_from_properties_parses_reference_keys():
    # C6 — PulsarUtils.java:22-114 string→typed parse
    cfg = PulsarSourceConfig.from_properties(
        {
            "serviceUrl": "pulsar+ssl://broker:6651",
            "topicNames": "t0, t1 ,t2",
            "subscriptionName": "sub1",
            "subscriptionType": "Key_Shared",
            "subscriptionInitialPosition": "Earliest",
            "dlqMaxRedeliverCount": "3",
            "batchingMaxMessages": "500",
            "readCompacted": "true",
            "authorizationType": "JWT",
            "token": "abc",
            "pulsar.client.numIoThreads": "4",
        }
    )
    assert cfg.topics == ["t0", "t1", "t2"]  # S1 split on "," + trim
    assert cfg.subscription_type is SubscriptionType.KEY_SHARED
    assert cfg.initial_position is SubscriptionInitialPosition.EARLIEST
    assert cfg.dlq.max_redeliveries == 3
    assert cfg.batch_policy and cfg.batch_policy.max_num_messages == 500
    assert cfg.read_compacted is True
    assert cfg.tls_enabled is True
    assert cfg.client_options == {"pulsar.client.numIoThreads": "4"}


def test_invalid_enum_message_lists_valid_values():
    # parity with SynapseException at parse (PulsarMessageConsumer.java:383)
    with pytest.raises(PulsarConfigError, match="Exclusive"):
        PulsarSourceConfig.from_properties(
            {"serviceUrl": "pulsar://h:6650", "topicNames": "t", "subscriptionType": "Bogus"}
        )


def test_reader_options_jwt_and_offsets():
    cfg = PulsarSourceConfig(
        service_url="pulsar://h:6650",
        topics=["t"],
        auth_type=AuthType.JWT,
        jwt_token="tok",
        initial_position=SubscriptionInitialPosition.EARLIEST,
    )
    opts = cfg.to_reader_options()
    assert opts["startingOffsets"] == "earliest"  # S5
    assert opts["pulsar.client.authParams"] == "token:tok"
    assert opts["topics"] == "t"


def test_reader_options_full_contract():
    """Interface lock for the live connector path (untestable without a
    broker): the COMPLETE option dict emitted for a maximal config must
    be exactly the documented StreamNative pulsar-spark connector
    surface — a renamed or dropped key here silently breaks the real
    `format("pulsar")` path, so the mapping is pinned key-for-key."""
    cfg = PulsarSourceConfig(
        service_url="pulsar+ssl://broker:6651",
        topics=["persistent://tn/ns/a", "persistent://tn/ns/b"],
        subscription_name="mi-sub",
        initial_position=SubscriptionInitialPosition.EARLIEST,
        batch_policy=BatchReceivePolicy(max_num_messages=500),
        auth_type=AuthType.JWT,
        jwt_token="tok",
        client_options={"pulsar.client.operationTimeoutMs": "7000"},
    )
    assert cfg.to_reader_options() == {
        "service.url": "pulsar+ssl://broker:6651",
        "predefinedSubscription": "mi-sub",
        "startingOffsets": "earliest",
        "topics": "persistent://tn/ns/a,persistent://tn/ns/b",
        "maxEntriesPerTrigger": "500",
        "pulsar.client.authPluginClassName": (
            "org.apache.pulsar.client.impl.auth.AuthenticationToken"
        ),
        "pulsar.client.authParams": "token:tok",
        "pulsar.client.useTls": "true",
        "pulsar.client.operationTimeoutMs": "7000",
    }


def test_reader_options_pattern_contract():
    """Pattern-subscribe variant: topicsPattern replaces topics, plain
    pulsar:// URL emits no TLS key, Latest maps to 'latest'."""
    cfg = PulsarSourceConfig(
        service_url="pulsar://broker:6650",
        topics_pattern="persistent://tn/ns/topic-.*",
    )
    assert cfg.to_reader_options() == {
        "service.url": "pulsar://broker:6650",
        "predefinedSubscription": "spark-sub",
        "startingOffsets": "latest",
        "topicsPattern": "persistent://tn/ns/topic-.*",
    }
