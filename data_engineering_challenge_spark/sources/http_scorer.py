"""HTTP scorer adapter for ``attribute_external`` — the reference's IHC
attribution API client contract (pipeline/api_client.py:26-65), rebuilt as
a worker-side ``ScoreFn`` with explicit retry/backoff/throttle.

Contract (inferred from the reference client):

* request:  ``POST {api_url}?conv_type_id={conv_type_id}`` with headers
  ``Content-Type: application/json`` + ``x-api-key``, body
  ``{"customer_journeys": [...]}`` (api_client.py:26-30,41-48);
* response: JSON object whose ``value`` key holds rows with
  ``conversion_id`` / ``session_id`` / ``ihc`` (api_client.py:55-61).

Posture differences from the reference, all deliberate:

* the reference sleeps 1 s between every chunk and silently DROPS a chunk
  whose request errored (api_client.py:50-65,219,244 — ``None`` return →
  conversions lost).  Here transient failures (HTTP 429/5xx, URL errors)
  retry with exponential backoff and a final failure RAISES — a failed
  batch fails the job rather than losing conversions;
* throttling is opt-in (``throttle_s``) and per worker — on a cluster the
  aggregate request rate is ``num_executors / throttle_s``, so size it to
  the API's documented limit;
* stdlib ``urllib`` only — no third-party HTTP dependency on executors.

Each Spark worker builds its own scorer from the (picklable) parameters;
the closure carries no sockets or sessions across the serialization
boundary.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

RETRYABLE_STATUS = {429, 500, 502, 503, 504}


def make_http_scorer(
    api_url: str,
    api_key: str = "",
    conv_type_id: str = "",
    timeout_s: float = 30.0,
    max_retries: int = 3,
    backoff_s: float = 1.0,
    throttle_s: float = 0.0,
    _urlopen=urllib.request.urlopen,
):
    """Build a ``ScoreFn`` (``list[dict] -> list[dict]``) that scores a
    journey batch against the reference's HTTP attribution API.

    ``_urlopen`` is injectable for tests.  Raises ``RuntimeError`` after
    ``max_retries`` failed attempts (each retried attempt backs off
    ``backoff_s * 2**attempt`` seconds).
    """
    if not api_url:
        raise ValueError("api_url is required for the HTTP scorer")
    url = api_url
    if conv_type_id:
        sep = "&" if "?" in api_url else "?"
        url = f"{api_url}{sep}conv_type_id={conv_type_id}"
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["x-api-key"] = api_key

    def score(journeys: list[dict]) -> list[dict]:
        if throttle_s:
            time.sleep(throttle_s)
        body = json.dumps({"customer_journeys": journeys}).encode()
        last_err: Exception | None = None
        for attempt in range(max_retries + 1):
            if attempt:
                time.sleep(backoff_s * 2 ** (attempt - 1))
            req = urllib.request.Request(url, data=body, headers=headers, method="POST")
            try:
                with _urlopen(req, timeout=timeout_s) as resp:
                    payload = json.loads(resp.read().decode())
                return payload.get("value", [])
            except urllib.error.HTTPError as e:
                last_err = e
                if e.code not in RETRYABLE_STATUS:
                    raise RuntimeError(
                        f"attribution API rejected the batch: HTTP {e.code}"
                    ) from e
            except urllib.error.URLError as e:
                last_err = e
        raise RuntimeError(
            f"attribution API failed after {max_retries + 1} attempts: {last_err}"
        ) from last_err

    return score
