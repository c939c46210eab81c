"""Deterministic synthetic CDC fixtures (FIXTURES.md §A).

Generates, with a fixed seed and no wall-clock reads:

- a base ``pages`` population: urls with zipf-skewed hot domains, per-url
  pseudo-HTML whose extracted text is non-trivial (tags, entities,
  script/style blocks, whitespace variety);
- change-event batches ``batch-{seq:05d}.csv`` with op ∈ {I,U,D} keyed by
  url, in-batch duplicate events for the same url (forces in-batch LWW),
  deletes followed by re-inserts, hot-domain clustering (skew);
- schema-evolution variants: additive column ``fetch_status`` (v2) and a
  rename ``lang`` → ``language`` declared in a sidecar meta file (v3) —
  mirrors the reference's sample-changedSchema corpus
  (/root/reference/src/test/data/sample-changedSchema/README.md:2-3).

CSV encoding of ``html`` is base64 (FIXTURES.md §A2).
"""

from __future__ import annotations

import base64
import csv
import io
import shutil
import json
import os
from dataclasses import dataclass, field

import numpy as np

from .extract import extract_text

EPOCH_BASE_S = 1_704_067_200  # 2024-01-01T00:00:00Z, fixed (no wall clock)

_LANGS = ["en", "de", "cs", "fr", "es"]

_WORDS = (
    "alpha beta gamma delta crawl web page spark merge lake table stream "
    "batch schema epoch commit snapshot url domain text html extract "
    "window shuffle partition skew salt broadcast join filter"
).split()


def _url(domain_id: int, page_id: int) -> str:
    return f"https://d{domain_id}.example.com/page/{page_id}"


def make_html(url: str, ts_s: int, rng_val: int, pad_bytes: int = 0) -> bytes:
    """Deterministic pseudo-HTML for (url, ts). Exercises every extraction
    rule: script/style removal, comments, entities, nested tags, whitespace.

    ``pad_bytes`` appends a deterministic word-filler paragraph so studies
    can size payloads realistically (a Common-Crawl page is ~100 KB; the
    unpadded fixture is ~400 B). Default 0 keeps every existing byte-parity
    expectation unchanged."""
    w = [_WORDS[(rng_val + i * 7) % len(_WORDS)] for i in range(12)]
    pad = ""
    if pad_bytes > 0:
        unit = " ".join(_WORDS[(rng_val + i * 13) % len(_WORDS)] for i in range(8))
        filler = (unit + " ") * (pad_bytes // (len(unit) + 1) + 1)
        pad = f"<p>{filler[:pad_bytes]}</p>\n"
    body = (
        f"<html>\n<head><title>{w[0]} {w[1]}</title>\n"
        f"<style>body {{ color: red; }}</style></head>\n"
        f"<body>\n<!-- comment {rng_val} -->\n"
        f"<script type='text/javascript'>var x = {rng_val};</script>\n"
        f"<h1>{w[2]} &amp; {w[3]}</h1>\n"
        f"<p>  {w[4]}   {w[5]}\t{w[6]} &lt;{w[7]}&gt; &quot;{w[8]}&quot;</p>\n"
        f"<div><span>{w[9]}</span> &#39;{w[10]}&#39; &nbsp; {w[11]}</div>\n"
        f"{pad}"
        f"<p>url={url} ts={ts_s}</p>\n</body></html>"
    )
    return body.encode("utf-8")


@dataclass
class ChangeLogSpec:
    n_urls: int = 1000
    n_batches: int = 8
    events_per_batch: int = 500
    n_domains: int = 50
    zipf_a: float = 1.5  # domain skew — a few hot domains dominate
    seed: int = 42
    p_insert: float = 0.45
    p_update: float = 0.4
    p_delete: float = 0.15
    schema_v2_from_batch: int | None = None  # batch idx where fetch_status appears
    schema_v3_from_batch: int | None = None  # batch idx where lang→language renames
    html_pad_bytes: int = 0  # extra deterministic payload per page (see make_html)
    out_dir: str = field(default="")


BATCH_COLUMNS_V1 = ["op", "url", "warc_ts", "html", "lang"]
BATCH_COLUMNS_V2 = ["op", "url", "warc_ts", "html", "lang", "fetch_status"]
BATCH_COLUMNS_V3 = ["op", "url", "warc_ts", "html", "language", "fetch_status"]


def generate_change_log(spec: ChangeLogSpec) -> list[str]:
    """Write batch CSVs under spec.out_dir; return the file paths in replay
    order (filename sort = replay order, mirroring the reference's input
    sorting, util/FilesUtils.kt:70-84).

    Round-6 optimization (the generator sits inside the bench's timed CDC
    section — guide §1.2, fix the per-task work): the event DECISIONS
    (every RNG draw, in the exact legacy call order, plus the
    deleted/ever_inserted set state) stay a sequential loop — they are
    inherently ordered — but the expensive RENDERING (make_html, base64,
    timestamp formatting, CSV encoding) is a pure function of the decision
    tuples and fans out over a process pool for large logs. Output is
    byte-identical to the sequential writer (same RNG stream, same csv
    dialect, chunks concatenated in order); small logs render inline so
    test fixtures don't pay pool startup."""
    assert spec.out_dir, "spec.out_dir required"
    os.makedirs(spec.out_dir, exist_ok=True)
    rng = np.random.RandomState(spec.seed)

    # zipf-skewed domain per url id (hot domains get many urls AND many events)
    domains = np.minimum(rng.zipf(spec.zipf_a, size=spec.n_urls), spec.n_domains) - 1
    paths: list[str] = []
    ever_inserted: set[int] = set()
    deleted: set[int] = set()

    pool = None
    try:
        for b in range(spec.n_batches):
            if spec.schema_v3_from_batch is not None and b >= spec.schema_v3_from_batch:
                cols, version = BATCH_COLUMNS_V3, 3
            elif spec.schema_v2_from_batch is not None and b >= spec.schema_v2_from_batch:
                cols, version = BATCH_COLUMNS_V2, 2
            else:
                cols, version = BATCH_COLUMNS_V1, 1

            # ---- decision pass: consumes the RNG in the exact legacy
            # order (uid, ts jitter, op draw, [html seed], [fetch draw])
            decisions: list[tuple] = []
            for i in range(spec.events_per_batch):
                uid = int(rng.randint(0, spec.n_urls))
                # event time: mostly monotone with batch, but jittered so
                # that out-of-order events exist (LWW must resolve them)
                ts_s = EPOCH_BASE_S + b * 3600 + int(rng.randint(-900, 3600))
                r = rng.random_sample()
                if uid in deleted and r < 0.5:
                    op = "I"  # re-insert after delete (required invariant)
                    deleted.discard(uid)
                elif uid not in ever_inserted or r < spec.p_insert:
                    op = "I"
                elif r < spec.p_insert + spec.p_update:
                    op = "U"
                else:
                    op = "D"
                    deleted.add(uid)
                ever_inserted.add(uid)
                if op == "D":
                    decisions.append((op, uid, ts_s, -1, ""))
                else:
                    html_seed = int(rng.randint(0, 1 << 30))
                    fetch = (
                        str(200 + int(rng.randint(0, 2)) * 104)
                        if version >= 2
                        else ""
                    )
                    decisions.append((op, uid, ts_s, html_seed, fetch))

            # ---- rendering pass: pure function of the decisions. Workers
            # write part-files and the parent concatenates in order —
            # returning the CSV text through the pool pipe serialized the
            # whole 0.5 GB back through pickle and erased the parallelism.
            path = os.path.join(spec.out_dir, f"batch-{b:05d}.csv")
            chunk = 50_000
            chunks = [
                (
                    decisions[i : i + chunk],
                    version,
                    domains,
                    spec.html_pad_bytes,
                    f"{path}.part{i // chunk}",
                )
                for i in range(0, len(decisions), chunk)
            ]
            if len(chunks) > 1:
                if pool is None:
                    from concurrent.futures import ProcessPoolExecutor

                    pool = ProcessPoolExecutor(
                        max_workers=min(32, os.cpu_count() or 4)
                    )
                parts = list(pool.map(_render_chunk_to_file, chunks))
            else:
                parts = [_render_chunk_to_file(c) for c in chunks]
            with open(path, "wb") as f:
                hdr = io.StringIO(newline="")
                csv.writer(hdr).writerow(cols)
                f.write(hdr.getvalue().encode("utf-8"))
                for part in parts:
                    with open(part, "rb") as pf:
                        shutil.copyfileobj(pf, f, 1 << 20)
                    os.remove(part)
            if version == 3:
                # rename map travels in a sidecar manifest (FIXTURES.md §A3)
                with open(path + ".meta.json", "w") as f:
                    json.dump({"renames": {"lang": "language"}}, f)
            paths.append(path)
    finally:
        if pool is not None:
            pool.shutdown()
    return paths


def _render_chunk_to_file(args: tuple) -> str:
    """Render a slice of decision tuples to a CSV part-file (no header) —
    the byte-exact equivalent of the legacy csv.DictWriter loop:
    csv.writer with the same default dialect emits identical bytes for
    the same field sequence, and the field order below matches
    BATCH_COLUMNS_V{n}. Returns the part path."""
    decisions, version, domains, pad_bytes, part_path = args
    ts_cache: dict[int, str] = {}
    rows = []
    for op, uid, ts_s, html_seed, fetch in decisions:
        url = _url(int(domains[uid]), uid)
        ts_str = ts_cache.get(ts_s)
        if ts_str is None:
            ts_str = ts_cache[ts_s] = _ts_str(ts_s)
        if op == "D":
            html_b64, lang = "", ""
        else:
            html = make_html(url, ts_s, html_seed, pad_bytes)
            html_b64 = base64.b64encode(html).decode("ascii")
            lang = _LANGS[uid % len(_LANGS)]
        # v1 has no fetch_status column; v2/v3 append it (v3's lang value
        # rides under the renamed `language` header, same position)
        rows.append(
            (op, url, ts_str, html_b64, lang)
            if version == 1
            else (op, url, ts_str, html_b64, lang, fetch)
        )
    with open(part_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return part_path


def _ts_str(ts_s: int) -> str:
    days = ts_s // 86400
    rem = ts_s % 86400
    # civil date from epoch day (Howard Hinnant algorithm), avoids datetime tz traps
    z = days + 719468
    era = z // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    if m <= 2:
        y += 1
    return f"{y:04d}-{m:02d}-{d:02d} {rem // 3600:02d}:{(rem % 3600) // 60:02d}:{rem % 60:02d}"


def reference_fold(batch_paths: list[str]) -> dict[str, dict]:
    """Single-process oracle: replay batches in order, LWW per (url, warc_ts)
    with (batch_seq, row_idx) tiebreak, exactly the semantics the Spark merge
    must reproduce. Returns {url: {warc_ts, text, lang, ...}}.

    Mirrors the reference's monotone-counter/replay-order discipline
    (csv-cruncher Cruncher.kt:342-372, tests CsvCruncherTestUtils.kt:51-75).
    """
    state: dict[str, dict] = {}
    for batch_seq, path in enumerate(batch_paths):
        renames = {}
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                renames = json.load(f).get("renames", {})
        inv_renames = {v: k for k, v in renames.items()}
        with open(path, newline="") as f:
            reader = csv.DictReader(f)
            # in-batch LWW: last writer per url by (warc_ts, row_idx)
            winners: dict[str, tuple] = {}
            for row_idx, row in enumerate(reader):
                row = {inv_renames.get(k, k): v for k, v in row.items()}
                key = (row["warc_ts"], row_idx)
                cur = winners.get(row["url"])
                if cur is None or key >= cur[0]:
                    winners[row["url"]] = (key, row)
            for url, (key, row) in winners.items():
                ts = row["warc_ts"]
                old = state.get(url)
                if old is not None and ts < old["warc_ts"]:
                    continue  # stale event loses to current state
                if row["op"] == "D":
                    state.pop(url, None)
                else:
                    html = base64.b64decode(row["html"])
                    state[url] = {
                        "warc_ts": ts,
                        "html": html,
                        "text": extract_text(html),
                        "lang": row.get("lang") or None,
                        "fetch_status": int(row["fetch_status"])
                        if row.get("fetch_status")
                        else None,
                    }
    return state
