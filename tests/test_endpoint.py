"""Endpoint resolution chain: env -> parameter store -> error, plus URL
validation (``cloudwatchlogs-with-dlq/cloudwatchlogs_lambda.js:25-40,
112-126``)."""

import pytest

from sumologic_aws_lambda_spark.streaming.endpoint import (
    EndpointConfigError,
    resolve_endpoint,
    validate_endpoint,
)

URL = "https://endpoint.example.com/receiver/v1/http/abc"


def test_env_wins_over_store():
    calls = []

    def store(name):
        calls.append(name)
        return "https://store.example.com/x"

    assert resolve_endpoint({"SUMO_ENDPOINT": URL}, store) == URL
    assert calls == []


def test_store_fallback():
    assert resolve_endpoint({}, {"SUMO_ENDPOINT": URL}.get) == URL


def test_neither_source_errors_with_guidance():
    # the guidance must name the EXACT key the lookup uses
    with pytest.raises(EndpointConfigError, match="'SUMO_ENDPOINT'"):
        resolve_endpoint({}, None)


def test_store_failure_is_wrapped():
    def store(name):
        raise RuntimeError("AccessDenied")

    with pytest.raises(EndpointConfigError, match="AccessDenied"):
        resolve_endpoint({}, store)


def test_cwl_config_from_env_resolves_endpoint():
    from sumologic_aws_lambda_spark.sources.cwl import CwlConfig

    cfg = CwlConfig.from_env(
        {"LOG_FORMAT": "VPC-JSON", "INCLUDE_LOG_INFO": "true",
         "LOG_STREAM_PREFIX": "api,web"},
        {"SUMO_ENDPOINT": URL}.get,
    )
    assert cfg.sumo_url == URL
    assert cfg.log_format == "VPC-JSON"
    assert cfg.include_log_info is True
    assert cfg.log_stream_prefixes == ("api", "web")


def test_cwl_config_from_env_requires_endpoint():
    from sumologic_aws_lambda_spark.sources.cwl import CwlConfig

    with pytest.raises(EndpointConfigError):
        CwlConfig.from_env({})


@pytest.mark.parametrize("bad", [
    "http://insecure.example.com/path",   # not https
    "https:///no-host",                   # no host
    "https://no-path.example.com",        # no path
    "not a url",
])
def test_invalid_urls_rejected(bad):
    with pytest.raises(EndpointConfigError, match="Invalid"):
        validate_endpoint(bad)
