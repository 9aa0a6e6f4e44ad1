import os
import pickle

import numpy as np
import pytest

from image_search_engine_for_historical_research_tpu import data
from image_search_engine_for_historical_research_tpu.data import synthetic


class TestImages:
    def test_load_test_image_thumbnail(self, tmp_path):
        from PIL import Image

        p = str(tmp_path / "a.jpg")
        Image.fromarray(np.zeros((200, 400, 3), np.uint8)).save(p)
        arr = data.load_test_image(p, imsize=100)
        assert max(arr.shape[:2]) <= 100
        assert arr.shape[2] == 3
        # normalized: zeros image -> -mean/std
        np.testing.assert_allclose(
            arr[0, 0], (0 - data.images.IMAGENET_MEAN) / data.images.IMAGENET_STD,
            rtol=1e-5,
        )

    def test_bbx_crop_scales_relative_to_full(self, tmp_path):
        from PIL import Image

        p = str(tmp_path / "b.jpg")
        Image.fromarray(np.zeros((400, 800, 3), np.uint8)).save(p)
        # crop box of half the image; thumbnail target imsize*max(crop)/max(full)
        arr = data.load_test_image(p, imsize=100, bbx=(0, 0, 400, 400))
        assert max(arr.shape[:2]) <= 50 + 1

    def test_train_image_square(self, tmp_path):
        from PIL import Image

        p = str(tmp_path / "c.jpg")
        Image.fromarray(np.zeros((200, 300, 3), np.uint8)).save(p)
        arr = data.load_train_image(p, 96, np.random.default_rng(0))
        assert arr.shape == (96, 96, 3)

    def test_bucket_batches_groups_and_masks(self):
        rng = np.random.default_rng(0)
        arrays = [
            (0, rng.standard_normal((60, 90, 3)).astype(np.float32)),
            (1, rng.standard_normal((64, 96, 3)).astype(np.float32)),   # same canvas
            (2, rng.standard_normal((100, 50, 3)).astype(np.float32)),  # other canvas
        ]
        batches = list(data.bucket_batches(iter(arrays), batch_size=8))
        assert len(batches) == 2
        by_size = {b.images.shape[1:3]: b for b in batches}
        assert (64, 96) in by_size and (128, 64) in by_size
        b0 = by_size[(64, 96)]
        assert set(b0.indices.tolist()) == {0, 1}
        # masks match original extents
        i0 = list(b0.indices).index(0)
        assert b0.mask[i0].sum() == 60 * 90
        np.testing.assert_allclose(b0.images[i0, :60, :90], arrays[0][1])
        assert not b0.images[i0, 60:, :].any()


class TestStore:
    def test_roundtrip(self, tmp_path):
        vecs = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
        paths = [f"img{i}.jpg" for i in range(5)]
        data.save_path_feature("mydb", vecs, paths, root=str(tmp_path))
        v, p = data.load_path_features("mydb", root=str(tmp_path))
        np.testing.assert_allclose(v, vecs)
        assert p == paths

    def test_reads_reference_pickle_format(self, tmp_path):
        os.makedirs(tmp_path / "features")
        vecs_dxn = np.random.default_rng(1).standard_normal((8, 5)).astype(np.float32)
        with open(tmp_path / "features" / "old_path_feature.pkl", "wb") as f:
            pickle.dump({"path": ["a", "b", "c", "d", "e"], "feature": vecs_dxn}, f)
        v, p = data.load_path_features("old", root=str(tmp_path))
        assert v.shape == (5, 8)  # transposed from D x N
        np.testing.assert_allclose(v, vecs_dxn.T)

    def test_slash_in_name(self, tmp_path):
        vecs = np.zeros((2, 3), np.float32)
        data.save_path_feature("GLM/test", vecs, ["x", "y"], root=str(tmp_path))
        v, p = data.load_path_features("GLM/test", root=str(tmp_path))
        assert v.shape == (2, 3)

    def test_sharded_store_roundtrip_and_resume(self, tmp_path):
        root = str(tmp_path)
        rng = np.random.default_rng(2)
        vecs = rng.standard_normal((10, 4)).astype(np.float32)
        paths = [f"im{i}.jpg" for i in range(10)]
        assert data.shard_resume_point("big", root=root) == 0
        data.save_feature_shard("big", 0, vecs[:4], paths[:4], root=root)
        data.save_feature_shard("big", 4, vecs[4:7], paths[4:7], root=root)
        # resume point = contiguous prefix end
        assert data.shard_resume_point("big", root=root) == 7
        data.save_feature_shard("big", 7, vecs[7:], paths[7:], root=root)

        chunks_fn, n = data.chunked_feature_source("big", root=root)
        assert n == 10
        got = np.concatenate(list(chunks_fn()))
        np.testing.assert_allclose(got, vecs)
        # re-iterable (the streaming builders make several passes)
        assert sum(c.shape[0] for c in chunks_fn()) == 10
        assert data.chunked_feature_relpaths("big", root=root) == paths

    def test_sharded_store_ignores_hole_and_feeds_streaming_build(
        self, tmp_path
    ):
        root = str(tmp_path)
        vecs = np.random.default_rng(3).standard_normal((9, 8)).astype(
            np.float32
        )
        data.save_feature_shard("holey", 0, vecs[:3], ["a", "b", "c"],
                                root=root)
        # rows 3..5 missing: the later shard must NOT count as complete
        data.save_feature_shard("holey", 6, vecs[6:], ["g", "h", "i"],
                                root=root)
        assert data.shard_resume_point("holey", root=root) == 3
        chunks_fn, n = data.chunked_feature_source("holey", root=root)
        assert n == 3

        with pytest.raises(FileNotFoundError):
            data.chunked_feature_source("absent", root=root)

        # end-to-end: shards -> streaming PQ build
        from image_search_engine_for_historical_research_tpu import index

        data.save_feature_shard(
            "holey", 3, vecs[3:6], ["d", "e", "f"], root=root
        )
        chunks_fn, n = data.chunked_feature_source("holey", root=root)
        assert n == 9
        ix = index.build_pq(chunks_fn, n=n, M=4, Ks=8, train_sample=9)
        assert int(ix.n) == 9

    def test_stale_regridded_shard_does_not_wedge_resume(self, tmp_path):
        """A leftover shard from an older --shard-size grid must be skipped
        (with a warning), not pin the resume point forever: the scenario is
        shards (0,3),(3,3),(6,3) where the middle one is deleted and
        extraction re-runs with --shard-size 4."""
        root = str(tmp_path)
        vecs = np.arange(48, dtype=np.float32).reshape(12, 4)
        paths = [f"p{i}" for i in range(12)]
        data.save_feature_shard("re", 0, vecs[:3], paths[:3], root=root)
        data.save_feature_shard("re", 6, vecs[6:9], paths[6:9], root=root)
        # resume at 3 (hole), re-extract with the new grid size 4
        assert data.shard_resume_point("re", root=root) == 3
        data.save_feature_shard("re", 3, vecs[3:7], paths[3:7], root=root)
        # the stale (6,3) shard overlaps the prefix end (7) — it must be
        # skipped so the NEXT shard written at 7 counts
        with pytest.warns(UserWarning, match="stale overlapping"):
            assert data.shard_resume_point("re", root=root) == 7
        data.save_feature_shard("re", 7, vecs[7:11], paths[7:11], root=root)
        with pytest.warns(UserWarning, match="stale overlapping"):
            assert data.shard_resume_point("re", root=root) == 11
        with pytest.warns(UserWarning):
            chunks_fn, n = data.chunked_feature_source("re", root=root)
        assert n == 11
        got = np.concatenate(list(chunks_fn()))
        np.testing.assert_allclose(got, vecs[:11])  # no duplicated rows
        with pytest.warns(UserWarning):
            assert data.chunked_feature_relpaths("re", root=root) == paths[:11]


class TestDatasets:
    def test_configdataset_revisited_synthetic(self, tmp_path):
        synthetic.make_revisited_dataset(str(tmp_path), "rsynthetic", n_classes=3, per_class=4)
        # configdataset only knows the standard names; load the pickle directly
        with open(tmp_path / "rsynthetic" / "gnd_rsynthetic.pkl", "rb") as f:
            cfg = pickle.load(f)
        assert len(cfg["imlist"]) == 12
        assert len(cfg["qimlist"]) == 3
        assert set(cfg["gnd"][0]) >= {"easy", "hard", "junk", "bbx"}
        jpgs = os.listdir(tmp_path / "rsynthetic" / "jpg")
        assert len(jpgs) == 15

    def test_configdataset_rejects_unknown(self, tmp_path):
        with pytest.raises(ValueError, match="Unknown dataset"):
            data.configdataset("nope", str(tmp_path))

    def test_path_all_jpg(self, tmp_path):
        synthetic.make_folder_dataset(str(tmp_path), n_classes=2, per_class=2)
        paths, rel = data.path_all_jpg(str(tmp_path / "db"), str(tmp_path))
        assert len(paths) == 4
        assert all(r.startswith("db/") for r in rel)


class TestSceneDatasets:
    def test_scene_sfm_dataset_ingests(self, tmp_path):
        from image_search_engine_for_historical_research_tpu.train import (
            tuples_from_db_pickle,
        )

        pkl = synthetic.make_scene_sfm_dataset(
            str(tmp_path), n_scenes=3, views_per_scene=3
        )
        ds = tuples_from_db_pickle(pkl, mode="train", nnum=1)
        assert len(ds.images) == 9
        assert len(ds.qpool) == 6  # consecutive view pairs per scene
        assert all(os.path.exists(p) for p in ds.images)

    def test_scene_revisited_shape(self, tmp_path):
        d = synthetic.make_scene_revisited(str(tmp_path), n_scenes=2, db_views=4)
        assert len(d["images"]) == 8 and len(d["qimages"]) == 2
        g = d["gnd"][0]
        assert len(g["easy"]) + len(g["hard"]) == 4
        assert all(os.path.exists(p) for p in d["images"] + d["qimages"])

    def test_scene_canvases_differ_but_views_share_structure(self):
        rng = np.random.default_rng(0)
        a = synthetic._scene_canvas(np.random.default_rng([1, 2, 3]), (96, 128))
        b = synthetic._scene_canvas(np.random.default_rng([1, 2, 4]), (96, 128))
        # identical global statistics, different patterns
        assert abs(a.mean() - b.mean()) < 20
        assert np.abs(a - b).mean() > 10
        v1 = synthetic._scene_view(rng, a, (64, 96))
        v2 = synthetic._scene_view(rng, a, (64, 96))
        assert v1.shape == (64, 96, 3) and v1.dtype == np.uint8
        assert not np.array_equal(v1, v2)
