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


def load_results_csv(path: str) -> pd.DataFrame:
    """S6 (utils/reports.py:44): read the clustering-results CSV.  Accepts
    either a file or a Spark csv output directory."""
    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".csv")]
        if not parts:
            raise FileNotFoundError(f"no csv part files in {path}")
        path = os.path.join(path, sorted(parts)[0])
    return pd.read_csv(path)


def melt_centers_pandas(data: pd.DataFrame) -> pd.DataFrame:
    """W1+W2 in the reference's pandas spelling (utils/reports.py:83-88)."""
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


def generate_pdf_report(data: pd.DataFrame, out_path: str) -> str:  # pragma: no cover
    """S7 (utils/reports.py:56,141-143) — import-gated: reportlab/seaborn are
    not in this container."""
    try:
        import reportlab  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "PDF report rendering requires reportlab (and seaborn for the "
            "plots); install them or use generate_report_text()"
        ) from exc
    raise NotImplementedError("reportlab present but renderer not implemented")


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
