"""Reporting + notification stage (reference parity: SURVEY.md §2.1 S6-S9,
§2.5 W1-W3, utils/reports.py).

The reference renders a PDF with seaborn/reportlab and emails it via a local
SMTP server (utils/reports.py:39-179).  Those libraries are driver-local and
not present in this container, so:

 - the data transformations (W1 per-group row number, W2 unpivot/melt,
   W3 distinct values) are provided in BOTH forms: Spark-native (scalable)
   and driver-local pandas (reference-shaped);
 - the report itself is a deterministic plain-text artifact with the same
   content (best k, silhouette table, per-cluster centers);
 - PDF rendering is import-gated (clear error naming the missing library);
 - email send uses an injectable transport so tests run without SMTP
   (reference behavior pinned: subject/body/attachment; failure-email
   fallback in pipeline.py).
"""

from __future__ import annotations

import os
from email.message import EmailMessage

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# W1-W3, Spark-native forms (scale path)
# --------------------------------------------------------------------------


def with_cluster_ids(results: DataFrame) -> DataFrame:
    """W1 (utils/reports.py:83): per-k cluster index 1..k.  The reference
    used pandas cumcount in FILE ORDER; here the order is explicit
    (monotonic cluster column from ml.kmeans.results_df) so the result is
    deterministic under any partitioning."""
    w = Window.partitionBy("k").orderBy("cluster")
    return results.withColumn("cluster_id", F.row_number().over(w))


def melt_centers(results: DataFrame, feature_names: list[str]) -> DataFrame:
    """W2 (utils/reports.py:88): wide center matrix → long
    (k, cluster, feature, value)."""
    return results.unpivot(
        ids=["k", "cluster"],
        values=list(feature_names),
        variableColumnName="feature",
        valueColumnName="value",
    )


def distinct_ks(results: DataFrame) -> list[int]:
    """W3 (utils/reports.py:90)."""
    return sorted(r.k for r in results.select("k").distinct().collect())


# --------------------------------------------------------------------------
# Driver-local pandas forms (reference-shaped, for the report stage)
# --------------------------------------------------------------------------


def load_results_csv(path: str, spark=None) -> pd.DataFrame:
    """S6 (utils/reports.py:44): read the clustering-results CSV.  Accepts
    a local file, a local Spark csv output directory (ALL part files are
    read and concatenated — reading only part-00000 silently drops rows
    whenever the writer used more than one task), or — when a
    SparkSession is passed — a `scheme://` directory on shared storage
    (pandas cannot list object-store keys)."""
    if "://" in path:
        if spark is None:
            raise ValueError(
                f"load_results_csv: {path} needs a SparkSession to read "
                "non-local storage (pass spark=...)"
            )
        return spark.read.option("header", True).csv(path).toPandas()
    if os.path.isdir(path):
        parts = sorted(f for f in os.listdir(path) if f.endswith(".csv"))
        if not parts:
            raise FileNotFoundError(f"no csv part files in {path}")
        frames = [pd.read_csv(os.path.join(path, p)) for p in parts]
        return pd.concat(frames, ignore_index=True)
    return pd.read_csv(path)


def melt_centers_pandas(data: pd.DataFrame) -> pd.DataFrame:
    """W1+W2 in the reference's pandas spelling (utils/reports.py:83-88).

    Cluster numbering: a reference-shaped CSV (no cluster column) gets the
    reference's 1-based cumcount labels; this engine's results_df carries
    an explicit 0-based `cluster` column which is used as-is — the two
    conventions are deliberate (bit-compat vs explicit-key) and reports
    label whichever the input carried."""
    data = data.copy()
    if "cluster" not in data.columns:
        data["cluster"] = data.groupby("k").cumcount() + 1
    return data.melt(
        id_vars=["k", "cluster"],
        value_vars=[c for c in data.columns if c not in ("k", "cluster", "score")],
        var_name="features",
    )


# --------------------------------------------------------------------------
# Report + email (S7-S9, driver-local)
# --------------------------------------------------------------------------


def generate_report_text(data: pd.DataFrame) -> str:
    """Deterministic text report with the same content as the reference PDF
    (utils/reports.py:39-145): k range, silhouette per k, best k, centers."""
    scores = data.groupby("k")["score"].first().sort_index()
    best_k = int(scores.idxmax())
    lines = [
        "K-means clustering report",
        "=" * 40,
        f"k scanned: {int(scores.index.min())}..{int(scores.index.max())}",
        f"best k by silhouette: {best_k} (score={scores[best_k]:.6f})",
        "",
        "silhouette per k:",
    ]
    for k, s in scores.items():
        lines.append(f"  k={int(k)}: {s:.6f}")
    lines.append("")
    lines.append("cluster centers (long form):")
    melted = melt_centers_pandas(data)
    for _, row in melted.sort_values(["k", "cluster", "features"]).iterrows():
        lines.append(
            f"  k={int(row.k)} cluster={int(row.cluster)} "
            f"{row.features}={row.value:.6f}"
        )
    return "\n".join(lines) + "\n"


_PDF_LINES_PER_PAGE = 54
_PDF_FONT_SIZE = 10
_PDF_LEADING = 13


def _pdf_escape(line: str) -> str:
    """PDF string-literal escaping; non-latin-1 chars become '?' (the
    base-14 Courier font has no wider encoding)."""
    line = line.encode("latin-1", errors="replace").decode("latin-1")
    return line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_minimal_pdf(lines: list[str], out_path: str, *, title: str = "report") -> str:
    """Dependency-free PDF 1.4 writer: monospace text pages, valid xref.

    Replaces the reference's reportlab canvas (utils/reports.py:56,141-143)
    with hand-assembled PDF objects — catalog, page tree, one content
    stream per page of Courier text.  Deterministic output for fixed input.
    """
    pages = [
        lines[i : i + _PDF_LINES_PER_PAGE]
        for i in range(0, max(len(lines), 1), _PDF_LINES_PER_PAGE)
    ]
    n_pages = len(pages)
    # Object ids: 1 catalog, 2 pages-root, 3 font, then per page i:
    # (4+2i) page dict, (5+2i) content stream.
    objects: list[bytes] = []
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    )
    for i, page_lines in enumerate(pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        body = [f"BT /F1 {_PDF_FONT_SIZE} Tf {_PDF_LEADING} TL 40 760 Td"]
        for line in page_lines:
            body.append(f"({_pdf_escape(line)}) Tj T*")
        body.append("ET")
        stream = "\n".join(body).encode("latin-1")
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    # Document info dict — where the `title` parameter actually lands.
    objects.append(f"<< /Title ({_pdf_escape(title)}) >>".encode("latin-1"))
    info_id = len(objects)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Info %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, info_id, xref_at)
    )
    with open(out_path, "wb") as f:
        f.write(bytes(out))
    return out_path


def generate_pdf_report(data: pd.DataFrame, out_path: str) -> str:
    """S7 (utils/reports.py:56,141-143): the text report rendered as a real
    PDF via the dependency-free writer above (reportlab/seaborn are not in
    this container; the plain-text artifact remains the default sink)."""
    return write_minimal_pdf(
        generate_report_text(data).splitlines(), out_path, title="kmeans-report"
    )


_SVG_W, _SVG_H = 640, 420
_SVG_ML, _SVG_MR, _SVG_MT, _SVG_MB = 70, 30, 50, 90
_SVG_COLORS = [
    "#4c72b0", "#dd8452", "#55a868", "#c44e52", "#8172b3",
    "#937860", "#da8bc3", "#8c8c8c",
]


def svg_pointplot(
    series: dict[str, list[tuple[str, float]]],
    *,
    title: str,
    y_label: str = "",
    out_path: str | None = None,
) -> str:
    """S8 (utils/reports.py:64-73,106-114): seaborn-pointplot-shaped chart
    as hand-assembled SVG — categorical x, linear y, one colored
    polyline+markers per series, legend, axis ticks.  Dependency-free and
    deterministic (seaborn/matplotlib are not in this container)."""
    x_labels: list[str] = []
    for pts in series.values():
        for x, _ in pts:
            if x not in x_labels:
                x_labels.append(x)
    ys = [y for pts in series.values() for _, y in pts if y == y]
    lo, hi = (min(ys), max(ys)) if ys else (0.0, 1.0)
    if hi == lo:
        hi, lo = hi + 0.5, lo - 0.5
    pad = 0.05 * (hi - lo)
    lo, hi = lo - pad, hi + pad
    plot_w = _SVG_W - _SVG_ML - _SVG_MR
    plot_h = _SVG_H - _SVG_MT - _SVG_MB

    def sx(i: int) -> float:
        n = max(len(x_labels), 1)
        return _SVG_ML + plot_w * (i + 0.5) / n

    def sy(v: float) -> float:
        return _SVG_MT + plot_h * (1 - (v - lo) / (hi - lo))

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_SVG_W}" '
        f'height="{_SVG_H}" viewBox="0 0 {_SVG_W} {_SVG_H}">',
        f'<rect width="{_SVG_W}" height="{_SVG_H}" fill="white"/>',
        f'<text x="{_SVG_W / 2}" y="28" text-anchor="middle" '
        f'font-family="sans-serif" font-size="16">{esc(title)}</text>',
        # axes
        f'<line x1="{_SVG_ML}" y1="{_SVG_MT}" x2="{_SVG_ML}" '
        f'y2="{_SVG_MT + plot_h}" stroke="black"/>',
        f'<line x1="{_SVG_ML}" y1="{_SVG_MT + plot_h}" '
        f'x2="{_SVG_ML + plot_w}" y2="{_SVG_MT + plot_h}" stroke="black"/>',
    ]
    if y_label:
        parts.append(
            f'<text x="16" y="{_SVG_MT + plot_h / 2}" text-anchor="middle" '
            f'font-family="sans-serif" font-size="12" '
            f'transform="rotate(-90 16 {_SVG_MT + plot_h / 2})">'
            f"{esc(y_label)}</text>"
        )
    for t in range(5):
        v = lo + (hi - lo) * t / 4
        y = sy(v)
        parts.append(
            f'<line x1="{_SVG_ML - 4}" y1="{y:.1f}" x2="{_SVG_ML}" '
            f'y2="{y:.1f}" stroke="black"/>'
        )
        parts.append(
            f'<text x="{_SVG_ML - 8}" y="{y + 4:.1f}" text-anchor="end" '
            f'font-family="sans-serif" font-size="11">{v:.3g}</text>'
        )
    for i, xl in enumerate(x_labels):
        x = sx(i)
        parts.append(
            f'<text x="{x:.1f}" y="{_SVG_MT + plot_h + 14}" '
            f'text-anchor="end" font-family="sans-serif" font-size="11" '
            f'transform="rotate(-45 {x:.1f} {_SVG_MT + plot_h + 14})">'
            f"{esc(xl)}</text>"
        )
    for si, (label, pts) in enumerate(series.items()):
        color = _SVG_COLORS[si % len(_SVG_COLORS)]
        coords = [
            (sx(x_labels.index(x)), sy(y)) for x, y in pts if y == y
        ]
        if len(coords) > 1:
            path = " ".join(f"{x:.1f},{y:.1f}" for x, y in coords)
            parts.append(
                f'<polyline points="{path}" fill="none" stroke="{color}" '
                f'stroke-width="1.5"/>'
            )
        for x, y in coords:
            parts.append(
                f'<circle cx="{x:.1f}" cy="{y:.1f}" r="4" fill="{color}"/>'
            )
        ly = _SVG_MT + 14 * si
        parts.append(
            f'<circle cx="{_SVG_ML + plot_w - 90}" cy="{ly - 4}" r="4" '
            f'fill="{color}"/>'
        )
        parts.append(
            f'<text x="{_SVG_ML + plot_w - 80}" y="{ly}" '
            f'font-family="sans-serif" font-size="11">{esc(label)}</text>'
        )
    parts.append("</svg>")
    svg = "\n".join(parts)
    if out_path is not None:
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(svg)
    return svg


def generate_plot_svgs(data: pd.DataFrame, out_dir: str) -> list[str]:
    """S8 parity with the reference's plot set (utils/reports.py:64-73,
    106-114): one silhouette-by-k pointplot + one per-k feature pointplot
    with cluster hue.  Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    scores = data.groupby("k")["score"].first().sort_index()
    score_path = os.path.join(out_dir, "score.svg")
    svg_pointplot(
        {"score": [(str(int(k)), float(s)) for k, s in scores.items()]},
        title="Silhouette scores by k",
        out_path=score_path,
    )
    paths.append(score_path)
    melted = melt_centers_pandas(data)
    for k in sorted(melted.k.unique()):
        sub = melted[melted.k == k]
        series = {
            f"cluster {int(c)}": [
                (str(r.features), float(r.value))
                for r in sub[sub.cluster == c].itertuples()
            ]
            for c in sorted(sub.cluster.unique())
        }
        p = os.path.join(out_dir, f"clusters_plot_{int(k)}.svg")
        svg_pointplot(series, title=f"k={int(k)}", out_path=p)
        paths.append(p)
    return paths


def generate_email(
    sender: str,
    recipient: str,
    subject: str,
    body: str,
    attachment_path: str | None = None,
) -> EmailMessage:
    """S9 message construction (utils/reports.py:148-170)."""
    msg = EmailMessage()
    msg["From"] = sender
    msg["To"] = recipient
    msg["Subject"] = subject
    msg.set_content(body)
    if attachment_path is not None:
        with open(attachment_path, "rb") as f:
            payload = f.read()
        msg.add_attachment(
            payload,
            maintype="application",
            subtype="octet-stream",
            filename=os.path.basename(attachment_path),
        )
    return msg


def send_email(msg: EmailMessage, transport=None, host: str = "localhost") -> None:
    """S9 send (utils/reports.py:175-179).  `transport` is injectable for
    tests; default is a localhost SMTP connection like the reference."""
    if transport is not None:
        transport.send_message(msg)
        return
    import smtplib

    with smtplib.SMTP(host) as s:  # pragma: no cover - needs an SMTP server
        s.send_message(msg)
