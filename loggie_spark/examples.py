"""The reference example pipeline, rebuilt (FIXTURES.md §F2, from
pkg/interceptor/transformer/example/pipeline.yml and
pkg/interceptor/transformer/action/grok_test.go:29-47).

Shared by tests, bench.py and __spark_entry__.py so the flagship
end-to-end query is defined exactly once.
"""

from __future__ import annotations

from loggie_spark.pipeline import PipelineConfig, SinkSpec, SourceSpec

ACCESS_PATTERN = (
    r"(?<ip>\S+) (?<id>\S+) (?<u>\S+) (?<time>\[.*?\]) "
    r'(?<url>".*?") (?<status>\S+) (?<size>\S+)'
)

APP_PATTERN = r"^(?P<time>[^ ^Z]+Z) (?P<level>[^ ]*) (?P<log>.*)$"

AUDIT_GROK = (
    "^%{DATESTAMP:datetime} (?P<file>[a-zA-Z0-9._-]+):%{INT:line}: "
    "%{IPV4:ip} %{PATH:path} %{UUID:uuid}"
)

ACCESS_PROGRAM = [
    {"action": "regex(body)", "pattern": ACCESS_PATTERN},
    {
        "if": "equal(status, 404)",
        "then": [{"action": "add(topic, not_found)"}, {"action": "return()"}],
    },
    {
        "if": "equal(status, 500)",
        "then": [{"action": "dropEvent()"}],
        "else": [{"action": "add(topic, common)"}],
    },
]

CONTAINER_PROGRAM = [
    {
        "if": "hasPrefix(body, {)",
        "then": [
            {"action": "jsonDecode(body)", "fields": ["log", "stream", "time"]},
            {"action": "add(topic, json)"},
        ],
        "else": [{"action": "add(topic, plain)"}],
    },
]

APP_PROGRAM = [
    {"action": "regex(body)", "pattern": APP_PATTERN},
    {"if": "equal(level, DEBUG)", "then": [{"action": "dropEvent()"}]},
    {"action": "add(topic, app)"},
]

AUDIT_PROGRAM = [
    {"action": "grok(body)", "match": AUDIT_GROK, "ignoreBlank": True},
    {"action": "add(topic, audit)"},
]


def reference_pipeline(
    time_col_name: str | None = None, n_buckets: int = 16, salt: int = 4
) -> PipelineConfig:
    """parse → route config covering all four fixture sources and the
    three sink shapes (kafka topic / ES dated index / file dir)."""
    return PipelineConfig(
        name="reference",
        sources=[
            SourceSpec("access", ACCESS_PROGRAM, fields={"fleet": "edge"}),
            SourceSpec("container", CONTAINER_PROGRAM, fields={"fleet": "k8s"}),
            SourceSpec("app", APP_PROGRAM, fields={"fleet": "svc"}),
            SourceSpec("audit", AUDIT_PROGRAM, fields={"fleet": "sec"}),
        ],
        sinks=[
            SinkSpec(
                name="kafka",
                route_pattern="${topic}",
                on_render_fail="default",
                default_route="loggie",
            ),
            SinkSpec(
                name="es",
                route_pattern="log-${source}-${+YYYY.MM.dd}",
                on_render_fail="fail",
            ),
            SinkSpec(
                name="file",
                route_pattern="var/log/${source}",
                on_render_fail="fail",
            ),
        ],
        n_buckets=n_buckets,
        salt=salt,
        time_col_name=time_col_name,
    )
