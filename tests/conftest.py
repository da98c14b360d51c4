from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small local runs: fast startup

from csv_crm_upload_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


GOOD_CSV = """id,first_name,last_name,email,phone
1,jon,doe,jon.doe@mail.com,+1 212 555 1234
2,jane,doe,jane.doe@mail.com,840 586 9744
3,sam,smith,sam@ex.com,
"""

# Mirrors assets/MOCK_BAD_DATA.csv dispositions (FIXTURES.md §2): bad id,
# two clean rows, empty email, duplicate email of line 2 — no header.
BAD_CSV = """500l,Rosabel,Tuckie,rtuckie@x.com,111
5002,Constancy,Benjafield,cbenjafield1@icq.com,222
5003,Carmen,Diaz,cdiaz@x.com,333
5004,Valerye,Brandt,,+221 555
5005,Celka,Dupe,cbenjafield1@icq.com,444
"""


@pytest.fixture()
def good_csv(tmp_path):
    p = tmp_path / "good.csv"
    p.write_text(GOOD_CSV)
    return str(p)


@pytest.fixture()
def bad_csv(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(BAD_CSV)
    return str(p)
