"""Declarative pipeline configuration + validation.

The reference's "query language" is its collector YAML: parsed by confmap,
validated per component ``Config.Validate()`` (e.g. interval ≥ 1s,
aggregationprocessor/config.go:33-47; compression whitelist,
awss3exporter/config.go:148-153). This module is the analogue: a plain
dataclass a user can build from a dict/YAML, validated before any Spark
job is constructed (EP1 in SURVEY.md §3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .operators.redact import DEFAULT_PII_PATTERNS

__all__ = ["PipelineConfig"]

_VALID_AGG = {"sum", "avg", "min", "max"}


@dataclass
class PipelineConfig:
    # S1 parse: logfmt fields → cast type
    parse_fields: dict[str, str] = field(
        default_factory=lambda: {
            "level": "string",
            "code": "int",
            "latency_ms": "int",
            "service": "string",
        }
    )
    # S3 redaction pattern table: (name, regex, mask)
    pii_patterns: list[tuple[str, str, str]] = field(
        default_factory=lambda: list(DEFAULT_PII_PATTERNS)
    )
    # S5 routing rule table: {rule_id, predicate, sink}
    rules: list[dict] = field(default_factory=list)
    default_sink: str = "default"
    # S7 aggregation
    agg_interval: str = "1 hour"
    agg_interval_seconds: int = 3600
    default_agg_type: str = "avg"
    # S6 fan-out
    partition_granularity: str = "day"  # day|hour|minute (partition.go default: minute)
    salt_partitions: int = 0  # >0 → salted repartition before write (hot convs)

    def validate(self) -> "PipelineConfig":
        if self.agg_interval_seconds < 1:
            # aggregationprocessor/config.go:42-44: interval must be ≥ 1s
            raise ValueError("agg_interval must be >= 1 second")
        if self.default_agg_type not in _VALID_AGG:
            raise ValueError(f"default_agg_type must be one of {_VALID_AGG}")
        if self.partition_granularity not in ("day", "hour", "minute"):
            raise ValueError("partition_granularity must be day|hour|minute")
        seen_ids = set()
        for r in self.rules:
            if not {"rule_id", "predicate", "sink"} <= set(r):
                raise ValueError(f"rule missing keys: {r}")
            if r["rule_id"] in seen_ids:
                raise ValueError(f"duplicate rule_id {r['rule_id']}")
            seen_ids.add(r["rule_id"])
            if r["sink"] == "":
                raise ValueError("rule sink must be non-empty")
        for name, regex, _mask in self.pii_patterns:
            import re

            try:
                re.compile(regex)
            except re.error as e:
                raise ValueError(f"bad pii pattern {name}: {e}") from e
        return self
