#!/usr/bin/env python3
"""Repo-side leak scan with a RUN STAMP.

The driver's LEAKCHECK.json carries only counters, so a re-run is
indistinguishable from a stale copy. This scanner walks every
git-tracked text file for generic secret/endpoint patterns and writes
LEAKCHECK_LOCAL.json stamped with the scan time, the commit scanned,
and the file count — an auditable evidence trail, not just a zero.

Patterns are deliberately GENERIC (cloud buckets, key material,
non-allowlisted URLs, chat links): the scan must not itself encode
anything non-public. Usage: python3 tools/leakcheck.py
"""
import json
import re
import subprocess
import time

# exact hosts or registrable suffixes; a URL passes iff its host EQUALS
# one of these or ends with "." + one of these (proper label boundary —
# a prefix/lookahead test would wave through github.com.evil.example)
ALLOWED_HOSTS = {
    "github.com", "raw.githubusercontent.com", "apache.org", "duckdb.org",
    "maven.apache.org", "repo1.maven.org", "docs.oracle.com", "openjdk.org",
    "scala-lang.org", "scalatest.org", "scalacheck.org", "wikipedia.org",
    "arxiv.org", "dl.acm.org", "doi.org", "localhost", "127.0.0.1",
    "example.com", "json-schema.org", "www.w3.org", "confluent.io",
}

URL = re.compile(r"https?://([\w.-]+)")

PATTERNS = {
    "s3-bucket": re.compile(r"s3a?://[\w.-]+"),
    "gcs-bucket": re.compile(r"gs://[\w.-]+"),
    "abfs-bucket": re.compile(r"abfss?://[\w.-]+"),
    "aws-access-key": re.compile(r"AKIA[0-9A-Z]{16}"),
    "private-key-block": re.compile(r"BEGIN (?:RSA |EC |OPENSSH )?PRIVATE KEY"),
    "chat-link": re.compile(r"[\w-]+\.slack\.com|hooks\.slack\.com"),
    "bearer-token": re.compile(r"Bearer [A-Za-z0-9_\-\.]{20,}"),
}


def host_allowed(host):
    h = host.lower().rstrip(".")
    return any(h == a or h.endswith("." + a) for a in ALLOWED_HOSTS)


def main():
    files = subprocess.check_output(["git", "ls-files"]).decode().split("\n")
    head = subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip()
    hits = {k: [] for k in PATTERNS}
    hits["url-not-allowlisted"] = []
    scanned = 0
    for f in files:
        if not f:
            continue
        try:
            text = open(f, encoding="utf-8", errors="strict").read()
        except (UnicodeDecodeError, IsADirectoryError, FileNotFoundError):
            continue  # binary fixtures / removed paths
        scanned += 1
        for ln, line in enumerate(text.split("\n"), 1):
            for m in URL.finditer(line):
                if not host_allowed(m.group(1)):
                    hits["url-not-allowlisted"].append(
                        f"{f}:{ln}: {m.group(0)[:80]}")
            for name, pat in PATTERNS.items():
                # every match on the line, not just the first — the
                # evidence trail must not undercount
                for m in pat.finditer(line):
                    hits[name].append(f"{f}:{ln}: {m.group(0)[:80]}")
    n = sum(len(v) for v in hits.values())
    report = {
        "scanned_at_utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": head,
        "files_scanned": scanned,
        "n_hits": n,
        "hits": hits,
    }
    with open("LEAKCHECK_LOCAL.json", "w") as out:
        json.dump(report, out, indent=2)
    print(f"scanned {scanned} files at {head[:10]}: {n} hits")
    return 0 if n == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
