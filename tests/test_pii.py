"""PII scan/redact kernels (functions/textstats): planted PII detected and
replaced; counts agree with a Python re replica of the same RE2 patterns."""

import re

import pyarrow as pa

from flatnav_ray.functions.textstats import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    pii_redact,
    pii_scan,
)

TEXTS = [
    "contact alice.smith+spam@example.co.uk or bob@test.io for details",
    "call +1 (555) 123-4567 or 555.987.6543 tomorrow",
    "server at 192.168.1.100 and 10.0.0.1 responded",
    "no pii here just plain words about data engines",
    "mixed: eve@corp.net from 172.16.254.3 dialed 1-800-555-0199",
    "",
]


def _py_count(text: str, pattern: str) -> int:
    return len(re.findall(pattern, text))


class TestPii:
    def test_counts_match_python_re(self):
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                "text": pa.array(TEXTS, type=pa.string()),
            }
        )
        out = pii_scan(batch)
        for i, t in enumerate(TEXTS):
            assert out.column("n_emails")[i].as_py() == _py_count(t, PII_EMAIL_RE)
            assert out.column("n_phones")[i].as_py() == _py_count(t, PII_PHONE_RE)
            assert out.column("n_ipv4")[i].as_py() == _py_count(t, PII_IPV4_RE)
        assert out.column("n_emails").to_pylist() == [2, 0, 0, 0, 1, 0]
        assert out.column("n_ipv4").to_pylist() == [0, 0, 2, 0, 1, 0]
        assert out.column("n_phones")[1].as_py() >= 1

    def test_redact_removes_all_pii(self):
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                "text": pa.array(TEXTS, type=pa.string()),
            }
        )
        red = pii_redact(batch)
        rescan = pii_scan(red)
        for col in ("n_emails", "n_phones", "n_ipv4"):
            assert sum(rescan.column(col).to_pylist()) == 0, col
        t0 = red.column("text")[0].as_py()
        assert "<EMAIL>" in t0 and "alice" not in t0
        # non-PII text untouched
        assert red.column("text")[3].as_py() == TEXTS[3]
