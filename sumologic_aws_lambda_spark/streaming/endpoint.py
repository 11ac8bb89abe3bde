"""Delivery-endpoint resolution (SURVEY §2.8 sink config).

Mirrors the reference's ``getConfig`` endpoint chain
(``cloudwatchlogs-with-dlq/cloudwatchlogs_lambda.js:25-40,112-126``):

1. explicit ``SUMO_ENDPOINT`` env/config value wins;
2. otherwise fetch the ``SUMO_ENDPOINT`` secure-string from the parameter
   store (SSM ``GetParameter`` with decryption);
3. either way the URL must be https with a host and a path, else the
   config is rejected.

The parameter store is injected as a callable — in AWS it's one SSM API
call; in tests it's a dict lookup.  Resolution happens ONCE on the driver
when a streaming sink is built, never per record/batch.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from urllib.parse import urlparse

PARAM_NAME = "SUMO_ENDPOINT"


class EndpointConfigError(ValueError):
    pass


def validate_endpoint(url: str) -> str:
    """https + host + path, per ``cloudwatchlogs_lambda.js:123-126``."""
    parsed = urlparse(url)
    if parsed.scheme != "https" or not parsed.netloc or not parsed.path:
        raise EndpointConfigError(
            f"Invalid SUMO_ENDPOINT environment variable: {url}")
    return url


def resolve_endpoint(
    env: Mapping[str, str] | None = None,
    parameter_store: Callable[[str], str | None] | None = None,
) -> str:
    """Env var first, then the parameter store, then a hard error naming
    both options (``cloudwatchlogs_lambda.js:112-120``)."""
    env = env or {}
    url = env.get(PARAM_NAME)
    if not url and parameter_store is not None:
        try:
            url = parameter_store(PARAM_NAME)
        except Exception as exc:
            raise EndpointConfigError(
                f"Unable to get EndpointURL from SSM: {exc}") from exc
    if not url:
        # name the EXACT key the lookup above uses — advising a
        # different parameter name would send operators in circles
        raise EndpointConfigError(
            f"Either define the {PARAM_NAME} environment variable or "
            f"create a secure string named {PARAM_NAME!r} in the "
            f"parameter store this resolver was given")
    return validate_endpoint(url)
