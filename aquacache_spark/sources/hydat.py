"""HYDAT database maintenance helpers.

- ``hydat_version_check`` mirrors R/hydat_check.R:13-72: compare the
  local HYDAT version stamp (a YYYYMMDD string derived from the DB's
  version date) against the remote publication stamp and decide
  whether a download is needed.  The download itself is injectable
  (``fetcher``) — no network here; the decision logic and the
  post-download re-verification (hydat_check.R:37-47: a download can
  silently fail, so the version is read back and compared again) are
  real.

- ``update_hydat_datums`` matches R/update_hydat_datums.R:8-17, which
  is a documented stub IN THE REFERENCE ("Function update_hydat_datums
  is not created yet... datums in the database should still be up to
  date"), kept here with the same contract so callers port cleanly.

The bulk HYDAT ingest (daily merge on gap days, update_hydat.R:7-9) is
the oracle-checked ``hydat_daily_merge`` query in queries.py.
"""

from __future__ import annotations

import warnings
from typing import Callable


def normalize_version(date_str: str) -> str:
    """'2024-06-17' -> '20240617' (hydat_check.R:30-31 gsub)."""
    return date_str.replace("-", "")


def hydat_version_check(
    local_version: str | None,
    remote_version: str,
    fetcher: Callable[[], str] | None = None,
    silent: bool = True,
) -> dict:
    """-> {updated: bool, new_hydat: bool, version: str}.

    ``fetcher()`` performs the download and returns the version stamp
    the local copy reports AFTER downloading (hydat_check.R:37-38 reads
    the version back rather than trusting the download).  With no local
    copy a fetch is mandatory; with a matching version nothing happens.
    """
    remote = normalize_version(remote_version)
    if local_version is not None and normalize_version(local_version) == remote:
        return {"updated": False, "new_hydat": False, "version": remote}
    if fetcher is None:
        raise NotImplementedError(
            "HYDAT download requires network access; pass fetcher() "
            "returning the post-download local version stamp"
        )
    post = normalize_version(fetcher())
    if post == remote:
        return {"updated": True, "new_hydat": True, "version": post}
    warnings.warn(
        "Failed to update the local HYDAT database. There is probably an "
        "active connection to the database preventing an overwrite."
    )
    return {"updated": False, "new_hydat": False, "version": post}


def update_hydat_datums(*_args, **_kwargs) -> None:
    """Reference parity: R/update_hydat_datums.R:8-17 is itself a stub
    that only warns — the reference has never implemented datum
    refresh. Mirrored verbatim so a ported caller gets the same
    behavior instead of a missing attribute."""
    warnings.warn(
        "update_hydat_datums is not implemented (the reference's own "
        "implementation is a documented stub); datums are expected to "
        "be maintained out of band."
    )
