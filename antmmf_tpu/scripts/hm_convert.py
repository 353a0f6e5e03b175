"""Hateful-Memes dataset converter: DrivenData zip → mmf_image_text layout.

Reference parity: ``/root/reference/antmmf/scripts/hm_convert.py`` (162 LoC) —
extract the (password-protected) competition zip, verify the expected
train/dev/test jsonl + img tree, checksum the archive, and lay files out where
the ``mmf_image_text`` builder reads them:

    <out>/annotations/{train,dev,test}.jsonl
    <out>/images/...

Pure stdlib (zipfile); no network.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import zipfile

JSONL_FILES = ("train.jsonl", "dev.jsonl", "test.jsonl")
KNOWN_CHECKSUMS = (
    "d8f1073f5fbf1b08a541cc2325fc8645619ab8ed768091fb1317d5c3a6653a77",
    "a424c003b7d4ea3f3b089168b5f5ea73b90a3ff043df4b8ff4d7ed87c51cb572",
    "6e609b8c230faff02426cf462f0c9528957b7884d68c60ebc26ff83846e5f80f",
)


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk)
            if not block:
                break
            h.update(block)
    return h.hexdigest()


def convert(zip_file: str, out_dir: str, password: str = None,
            verify_checksum: bool = True) -> dict:
    if verify_checksum:
        digest = sha256_of(zip_file)
        if digest not in KNOWN_CHECKSUMS:
            print(f"WARNING: zip checksum {digest} not in the known list — "
                  "proceeding anyway (new release?)")
    ann_dir = os.path.join(out_dir, "annotations")
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    pwd = password.encode() if password else None
    found = {name: False for name in JSONL_FILES}
    n_images = 0
    with zipfile.ZipFile(zip_file) as zf:
        for info in zf.infolist():
            base = os.path.basename(info.filename)
            if base in found:
                with zf.open(info, pwd=pwd) as src, \
                        open(os.path.join(ann_dir, base), "wb") as dst:
                    shutil.copyfileobj(src, dst)
                found[base] = True
            elif not info.is_dir() and "/img/" in "/" + info.filename:
                target = os.path.join(img_dir, base)
                with zf.open(info, pwd=pwd) as src, open(target, "wb") as dst:
                    shutil.copyfileobj(src, dst)
                n_images += 1
    missing = [k for k, v in found.items() if not v]
    if missing:
        raise AssertionError(f"{missing} missing from {zip_file}")
    print(f"converted: {sum(found.values())} annotation files, "
          f"{n_images} images → {out_dir}")
    return {"annotations": list(found), "n_images": n_images}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--zip_file", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--password", default=None)
    parser.add_argument("--no_checksum", action="store_true")
    args = parser.parse_args(argv)
    convert(args.zip_file, args.out_dir, args.password,
            verify_checksum=not args.no_checksum)


if __name__ == "__main__":
    main()
