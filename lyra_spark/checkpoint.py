"""Checkpoint manifest: per-partition lineage, rule versions, timing metrics —
resumable runs (BASELINE.json:6,14).

The manifest is driver-side JSON (small: one record per Iceberg partition),
written atomically (tmp + os.replace) so a killed run never leaves a torn
file. Resume = set-difference of partition keys whose recorded rule-version
fingerprint matches the current ruleset; bumping any rule's version or params
invalidates exactly the partitions validated under the old fingerprint.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

from lyra_spark.rules import RuleSet

MANIFEST_NAME = "manifest.json"


@dataclass
class PartitionRecord:
    partition: str
    ruleset_fingerprint: str
    rows: int
    violations: int
    wall_ms: float
    completed_at: float
    snapshot_id: str | None = None  # Iceberg snapshot lineage in prod
    rule_versions: dict[str, str] = field(default_factory=dict)


@dataclass
class Manifest:
    run_id: str
    records: dict[str, PartitionRecord] = field(default_factory=dict)

    def completed(self, ruleset: RuleSet) -> set[str]:
        fp = ruleset.fingerprint()
        return {k for k, r in self.records.items() if r.ruleset_fingerprint == fp}

    def pending(self, all_partitions: list[str], ruleset: RuleSet) -> list[str]:
        done = self.completed(ruleset)
        return [p for p in all_partitions if p not in done]

    def changed(
        self,
        ruleset: RuleSet,
        current_counts: dict[str, int],
        current_snapshot: str | None = None,
    ) -> set[str]:
        """Completed partitions whose DATA no longer matches what was
        validated. Detection precedence, per partition:

        1. When a current metadata count exists (parquet footers locally,
           Iceberg manifests in prod), a count that differs from the
           recorded one re-queues the partition. Counts are per-partition,
           so this is the FINE signal — and it deliberately wins over the
           snapshot id, because the snapshot is TABLE-level and bumps on
           every commit to any partition; snapshot-first would re-validate
           the whole table on each ingest.
        2. Only when no count is available does a moved snapshot id (both
           sides knowing one) re-queue the partition — the coarse fallback.

        Known limit: an in-place SAME-COUNT rewrite of a partition that
        still exposes metadata counts is not detected (its count matches and
        rule 1 short-circuits the snapshot comparison). Closing that needs a
        per-partition content signal — on Iceberg, the partition's data-file
        set/digests from the manifest — which this local layout cannot
        provide; callers who suspect such rewrites should bump the ruleset
        version or use a fresh run-id.

        This is the late-arriving-data half of resume: `pending()` alone
        would skip a partition forever once validated, silently leaving new
        rows unchecked.
        """
        fp = ruleset.fingerprint()
        out: set[str] = set()
        for pk, rec in self.records.items():
            if rec.ruleset_fingerprint != fp:
                continue  # already re-validated by the rule-version path
            if pk in current_counts:
                # per-partition counts are the finer signal: a table-level
                # snapshot bump (any Iceberg commit) must NOT re-validate
                # partitions whose counts prove them untouched
                if current_counts[pk] != rec.rows:
                    out.add(pk)
            elif (
                current_snapshot is not None
                and rec.snapshot_id is not None
                and current_snapshot != rec.snapshot_id
            ):
                out.add(pk)
        return out

    def record(
        self,
        partition: str,
        ruleset: RuleSet,
        rows: int,
        violations: int,
        wall_ms: float,
        snapshot_id: str | None = None,
    ) -> None:
        self.records[partition] = PartitionRecord(
            partition=partition,
            ruleset_fingerprint=ruleset.fingerprint(),
            rows=rows,
            violations=violations,
            wall_ms=wall_ms,
            completed_at=time.time(),
            snapshot_id=snapshot_id,
            rule_versions=ruleset.versions(),
        )


def manifest_path(checkpoint_dir: str, run_id: str) -> str:
    return os.path.join(checkpoint_dir, run_id, MANIFEST_NAME)


def load_manifest(checkpoint_dir: str, run_id: str) -> Manifest:
    path = manifest_path(checkpoint_dir, run_id)
    if not os.path.exists(path):
        return Manifest(run_id=run_id)
    try:
        with open(path) as f:
            raw = json.load(f)
        # record construction is inside the guard too: a schema-drifted
        # manifest (newer-version field, wrong top-level shape) is valid
        # JSON but still corrupt FOR THIS VERSION — the contract is
        # start-clean, never a crash on every resume
        records = {k: PartitionRecord(**v) for k, v in raw.get("records", {}).items()}
        return Manifest(run_id=raw.get("run_id", run_id), records=records)
    except (json.JSONDecodeError, OSError, TypeError, KeyError, AttributeError, ValueError):
        # corrupt manifest ⇒ start clean (forces full re-validation, never a crash)
        return Manifest(run_id=run_id)


def save_manifest(checkpoint_dir: str, m: Manifest) -> str:
    """Atomic write: tmp file + os.replace (POSIX-atomic within a filesystem)."""
    d = os.path.join(checkpoint_dir, m.run_id)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, MANIFEST_NAME)
    tmp = path + ".tmp"
    payload = {"run_id": m.run_id, "records": {k: asdict(v) for k, v in m.records.items()}}
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return path
