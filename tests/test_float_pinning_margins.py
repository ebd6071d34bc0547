"""Guard the pin-once float ops (pow/ln -> integer micro units).

mix_sources_temperature and the unigram queries round ONE transcendental
per value to an integer micro unit and do everything else in exact
integers. Cross-engine agreement then only breaks if a value lands
within ~1 ulp of a .5 rounding boundary. These tests measure the actual
boundary margins on both test corpora so fragile data is caught here,
not as a mysterious hash mismatch in the driver gate.
"""

import math

import duckdb
import pytest

_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
# libm vs JVM disagree by <= ~1e-13 relative on ln/pow in this range;
# demand 5 orders of magnitude of slack
_MIN_MARGIN = 1e-8


def _margin(x: float) -> float:
    frac = x - math.floor(x)
    return abs(frac - 0.5)


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_temperature_mix_pow_margins(sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH tok AS (
          SELECT source, sum(len(string_split(text, ' '))) AS t
          FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY source
        ),
        c AS (SELECT sum(t) AS total FROM tok)
        SELECT tok.t * 1.0 / c.total FROM tok CROSS JOIN c
        """
    ).fetchall()
    margins = [_margin(math.pow(share, 0.3) * 1_000_000) for (share,) in rows]
    assert margins and min(margins) > _MIN_MARGIN, min(margins)


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_unigram_ln_margins(sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH words AS (
          SELECT w, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(string_split(text, ' ')) AS w
                FROM read_parquet('{sf_dir}/documents.parquet'))
          WHERE w <> '' GROUP BY w HAVING len(w) <= 8
        ),
        freq AS (
          SELECT p, CAST(sum(cnt) AS BIGINT) AS f
          FROM (
            SELECT unnest(flatten(list_transform(range(1, len(w) + 1), i ->
                     list_transform(range(1, least(4, len(w) - i + 1) + 1), k ->
                       substr(w, i, k))))) AS p, cnt
            FROM words)
          GROUP BY p
        ),
        tot AS (SELECT sum(f) AS t FROM freq)
        SELECT f * 1.0 / t FROM freq CROSS JOIN tot
        """
    ).fetchall()
    margins = [_margin(1_000_000.0 * math.log(p)) for (p,) in rows]
    assert margins and min(margins) > _MIN_MARGIN, min(margins)
