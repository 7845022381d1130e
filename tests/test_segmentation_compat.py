"""Reference-compat pipeline tests on synthesized fixtures (FIXTURES.md §A).

Pins every reference quirk from SURVEY.md §2:
 - P1 age formula against the hard-coded reference date
 - A2 two-level agg (avg of per-SESSION sums, not raw prices)
 - J2/J3 inner joins dropping users without buys/clicks
 - J4 left join + A5 fill(0) for teamless users
 - A4 dropDuplicates: multi-team users multiply rows
 - P5 log of non-positive → null
 - P6 compat feature-slice order
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pyspark_kmeans_spark.operators.segmentation import (
    COMPAT_FEATURES,
    load_features,
    prepare_data,
    session_revenue,
    user_ages,
    user_revenue_stats,
    user_strengths,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    users = spark.createDataFrame(
        [
            (1, datetime.date(1990, 6, 16)),  # age 26.0 exactly (9497 days /365)
            (2, datetime.date(2000, 1, 1)),
            (3, datetime.date(1980, 1, 1)),  # no buys → dropped by J2
            (4, datetime.date(2016, 6, 16)),  # age 0 → log_age null
        ],
        "userId int, dob date",
    )
    buy_clicks = spark.createDataFrame(
        [
            # user 1: session 10 → 3+7=10, session 11 → 20 ⇒ avg 15, min 10, max 20
            (1, 10, 3.0),
            (1, 10, 7.0),
            (1, 11, 20.0),
            # user 2: one session
            (2, 20, 5.0),
            # user 4: zero-price session → min_buy 0 → log null
            (4, 40, 0.0),
        ],
        "userId int, userSessionId int, price double",
    )
    game_clicks = spark.createDataFrame(
        [(1, 1), (1, 0), (2, 1), (4, 1), (3, 0)],
        "userId int, isHit int",
    )
    user_session = spark.createDataFrame(
        [(1, 100), (1, 100), (1, 200), (2, 100)],  # user 1 on TWO teams
        "userId int, teamId int",
    )
    team = spark.createDataFrame(
        [(100, 50.0), (200, 80.0)], "teamId int, strength double"
    )
    return users, buy_clicks, game_clicks, user_session, team


def test_age_formula(spark, fixtures):
    users = fixtures[0]
    ages = {r.userId: r.age for r in user_ages(users).collect()}
    assert ages[1] == pytest.approx(9497 / 365)  # datediff/365, day resolution
    assert ages[4] == 0.0


def test_two_level_agg(fixtures):
    _, buy_clicks, *_ = fixtures
    stats = {
        r.userId: r for r in user_revenue_stats(session_revenue(buy_clicks)).collect()
    }
    # avg of per-session sums (10, 20) — NOT avg of raw prices (3,7,20)=10
    assert stats[1].avg_buy == 15.0
    assert stats[1].min_buy == 10.0
    assert stats[1].max_buy == 20.0


def test_multi_team_multiplication(fixtures):
    *_, user_session, team = fixtures
    rows = user_strengths(user_session, team).collect()
    user1 = [r for r in rows if r.userId == 1]
    # dropDuplicates on (userId, strength): two teams → two rows survive (A4)
    assert len(user1) == 2
    assert {r.strength for r in user1} == {50.0, 80.0}


def test_join_semantics_and_fill(fixtures):
    data = load_features(*fixtures)
    rows = {(r.userId, r.strength) for r in data.collect()}
    ids = {u for u, _ in rows}
    assert 3 not in ids  # no buys → inner join J2 drops
    assert 4 in ids  # has buys+clicks, no team → kept with strength 0 (J4+A5)
    assert (4, 0.0) in rows
    # user 1 multiplied through the left join: rows for both strengths
    assert (1, 50.0) in rows and (1, 80.0) in rows


def test_log_features_and_compat_slice(fixtures):
    data, features = prepare_data(*fixtures)
    assert features == COMPAT_FEATURES  # P6 exact order
    u4 = [r for r in data.collect() if r.userId == 4][0]
    assert u4.log_age is None  # log(0) → null (P5)
    assert u4.log_min_buy is None  # price 0 session
    u1 = [r for r in data.collect() if r.userId == 1][0]
    assert u1.log_avg_buy == pytest.approx(2.70805, abs=1e-4)  # ln(15)
