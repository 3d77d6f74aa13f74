"""K7 GDrive deterministic half: folder-chain explode, set-algebra upsert,
URL resolution, last-match duplicate policy (gdrive_storage.py parity)."""

from auto_archiver_spark.operators.gdrive import (
    folder_prefixes,
    pick_last_match,
    resolve_drive_urls,
    upsert_folder_tree,
)


def test_folder_prefixes_chains_and_root_files(spark):
    df = spark.createDataFrame(
        [("a/b/c/f.jpg",), ("a/b/g.png",), ("root.bin",)], "key string"
    )
    rows = {(r.key, r.path, r.parent_path, r.name, r.depth)
            for r in folder_prefixes(df).collect()}
    assert ("a/b/c/f.jpg", "a", "", "a", 1) in rows
    assert ("a/b/c/f.jpg", "a/b", "a", "b", 2) in rows
    assert ("a/b/c/f.jpg", "a/b/c", "a/b", "c", 3) in rows
    assert ("a/b/g.png", "a/b", "a", "b", 2) in rows
    # root-level files emit no folder rows (Drive keys are folder-scoped)
    assert not any(k == "root.bin" for k, *_ in rows)
    assert len(rows) == 5


def test_upsert_folder_tree_idempotent(spark):
    df = spark.createDataFrame([("a/b/f.jpg",), ("a/c/g.jpg",)], "key string")
    first = upsert_folder_tree(df)
    got = {r.path: r for r in first.collect()}
    assert set(got) == {"a", "a/b", "a/c"}
    assert got["a"].parent_id == "root" and got["a/b"].parent_id == got["a"].folder_id
    assert got["a/b"].depth == 2 and got["a/b"].name == "b"
    # second wave against the committed dimension creates nothing
    again = upsert_folder_tree(df, existing=first.select("path"))
    assert again.count() == 0
    # a new subtree only creates its missing prefixes
    df2 = spark.createDataFrame([("a/b/d/h.jpg",)], "key string")
    delta = upsert_folder_tree(df2, existing=first.select("path"))
    assert {r.path for r in delta.collect()} == {"a/b/d"}


def test_resolve_drive_urls(spark):
    df = spark.createDataFrame([("x/y/f.jpg",), ("top.bin",)], "key string")
    got = {r.key: r for r in resolve_drive_urls(df).collect()}
    r = got["x/y/f.jpg"]
    assert r.folder_path == "x/y" and len(r.folder_id) == 16 and len(r.file_id) == 16
    assert r.cdn_url == f"https://drive.google.com/file/d/{r.file_id}/view?usp=sharing"
    # folder-only support: root-level keys resolve to nothing (reference
    # get_cdn_url walks path parts and requires a folder)
    t = got["top.bin"]
    assert t.folder_path is None and t.file_id is None and t.cdn_url is None


def test_pick_last_match(spark):
    # two folders named the same under one parent: the reference returns the
    # LAST listing match (gdrive_storage.py:164-168)
    df = spark.createDataFrame(
        [("p1", "dup", "id_old", 1), ("p1", "dup", "id_new", 2), ("p1", "other", "id_x", 1)],
        "parent_id string, name string, folder_id string, ord int",
    )
    got = {(r.parent_id, r.name): r.folder_id
           for r in pick_last_match(df, ["parent_id", "name"]).collect()}
    assert got[("p1", "dup")] == "id_new"
    assert got[("p1", "other")] == "id_x"
