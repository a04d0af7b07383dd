"""Dataset packing CLI — equivalent of ``img2rec.py``: an ImageFolder tree
(class-per-directory) → indexed ``train.rec``/``train.idx`` + ``property``.

Example:
  python -m lafs_cvpr2024_tpu.cli.pack_dataset --data-dir /data/WebFace \
      --out /data/webface_rec
"""

from __future__ import annotations

import argparse
import io
import os


def main(argv=None):
    p = argparse.ArgumentParser("lafs-tpu dataset packer")
    p.add_argument("--data-dir", required=True, help="ImageFolder root")
    p.add_argument("--out", required=True)
    p.add_argument("--quality", type=int, default=95)
    p.add_argument("--size", type=int, default=112)
    args = p.parse_args(argv)

    from PIL import Image

    from ..data.recordio import RecBuilder

    classes = sorted(
        d for d in os.listdir(args.data_dir)
        if os.path.isdir(os.path.join(args.data_dir, d))
    )
    builder = RecBuilder(args.out, image_size=(args.size, args.size))
    count = 0
    for label, cls in enumerate(classes):
        cdir = os.path.join(args.data_dir, cls)
        for fname in sorted(os.listdir(cdir)):
            try:
                img = Image.open(os.path.join(cdir, fname)).convert("RGB")
            except OSError:
                continue
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=args.quality)
            builder.add_image(buf.getvalue(), label)
            count += 1
            if count % 10000 == 0:
                print(f"packed {count} images / {label + 1} classes")
    builder.close()
    print(f"done: {count} images, {len(classes)} classes → {args.out}")


if __name__ == "__main__":
    main()
