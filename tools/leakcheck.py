#!/usr/bin/env python3
"""Provenance-stamped leak scan over the repo's tracked sources.

Mirrors the driver's seven scan categories and writes LEAKCHECK_LOCAL.json
stamped with the scanned commit hash + UTC timestamp, so a round's "clean"
claim is verifiably tied to a fresh scan of a specific tree (a bare round
number in an artifact proves nothing about WHEN or WHAT was scanned).

Usage: python3 tools/leakcheck.py [repo_root]
Exit code 1 when any category hits.
"""
import json, re, subprocess, sys, datetime, os

CATEGORIES = {
    # non-public package/import roots (anything not spark/hadoop/scala/java
    # stdlib or this repo's own `graft` namespace is suspect in imports)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|org\.scalatest|org\.scalacheck|"
        r"scala\.|java\.|javax\.|graft\.|org\.slf4j|com\.fasterxml)"
        r"[a-z]+\.[a-z0-9_.]+", re.M),
    # URLs outside well-known public hosts
    "internal-url": re.compile(
        r"https?://(?!(?:www\.|docs\.|spark\.)?apache\.org|github\.com|"
        r"duckdb\.org|dev\.mysql\.com|mariadb\.com|arxiv\.org|"
        r"localhost|127\.0\.0\.1|en\.wikipedia\.org)[A-Za-z0-9.-]+"),
    # maven-style non-public group ids in build files
    "internal-pkg2": re.compile(
        r'"(?!org\.apache|org\.scala|org\.scalatest|org\.scalacheck|'
        r'com\.github|io\.github)[a-z]+\.[a-z]+\.[a-z0-9-]+"\s*%'),
    # object-store bucket references
    "internal-bucket": re.compile(r"s3a?://(?!bucket|my-bucket|example)[a-z0-9][a-z0-9.-]{4,}"),
    # chat/webhook links
    "slack-link": re.compile(r"hooks\.slack\.com|slack\.com/archives|/webhook/T[A-Z0-9]+"),
    # credential-shaped strings
    "api-key": re.compile(r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36})\b"),
    # suspicious env-var prefixes (anything not this repo's SPARK_GRAFT_*
    # or standard SPARK_/JAVA_/HADOOP_ knobs read via sys.env)
    "axon-env": re.compile(
        r'sys\.env(?:\.getOrElse)?\(\s*"(?!SPARK_GRAFT_|SPARK_|JAVA_|HADOOP_|PATH|HOME|TMPDIR)[A-Z_]+"'),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".sql", ".json", ".properties"}
SKIP_FILES = {"tools/leakcheck.py", "LEAKCHECK.json", "LEAKCHECK_LOCAL.json",
              "PAPERS.md", "SNIPPETS.md"}  # retrieved content is scanned by the driver


def main(root: str) -> int:
    os.chdir(root)
    files = subprocess.run(["git", "ls-files"], capture_output=True, text=True,
                           check=True).stdout.splitlines()
    commit = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                            text=True, check=True).stdout.strip()
    dirty = bool(subprocess.run(["git", "status", "--porcelain"],
                                capture_output=True, text=True, check=True).stdout.strip())
    hits = {k: [] for k in CATEGORIES}
    for f in files:
        if f in SKIP_FILES or os.path.splitext(f)[1] not in SCAN_EXT:
            continue
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                frag = m.group(0)
                # Scala value imports (import s.implicits._ / df.sparkSession…)
                # are local-scope sugar, not packages
                if cat == "internal-import" and (
                        "implicits" in frag or ".spark" in frag or
                        re.match(r"^\s*import\s+[a-z]{1,2}\.", frag)):
                    continue
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}:{frag[:80]}")
    n = sum(len(v) for v in hits.values())
    out = {
        "commit": commit,
        "dirty_tree": dirty,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "n_files": len(files),
        "n_hits": n,
        "hits": hits,
    }
    with open("LEAKCHECK_LOCAL.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"leakcheck: {n} hits across {len(files)} tracked files "
          f"@ {commit[:12]}{' (dirty)' if dirty else ''}")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "."))
