import shutil

from htrc_feature_reader_ray.pipelines.flagship import flagship, flagship_from_lake
from htrc_feature_reader_ray.sources.pages import write_pages_lake
from tests.util import assert_frames_match

LAKE = "/tmp/graft_test_pages_lake"


def setup_module(mod):
    shutil.rmtree(LAKE, ignore_errors=True)


def test_lake_flagship_matches_synth_flagship(sf_dir):
    m = write_pages_lake(sf_dir, LAKE, num_buckets=8)
    assert m["row_count"] == sum(1 + d % 3 for d in range(500))
    from_lake = flagship_from_lake(LAKE, sf_dir, num_buckets=8).to_pandas()
    from_synth = flagship(sf_dir, via_html=True, num_buckets=8).to_pandas()
    assert_frames_match(from_lake, from_synth)
