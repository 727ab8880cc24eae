#!/usr/bin/env python
"""PixelLink full-resolution inference entry.

Working rebuild of /root/reference/test_pixellink.py (broken there): like
test_pixellink_fast.py but decodes at the model's stride-4 grid and keeps
the reference's larger group threshold (>200 px at full res ~= >12 at
stride 4, reference :178) and 0.9 link threshold.

    python test_pixellink.py --test_data_path=./icdar_test/ \
        --checkpoint_path=./ohem_logs/ --output_dir=./tmp/
"""

import sys


def main(argv):
    import test_pixellink_fast

    # The reference's "slow" variant differs only in decode resolution and
    # group threshold; with on-device decode the stride-4 grid is exact, so
    # both entries share the implementation with a stricter size filter.
    argv = list(argv) + ["--infer.min_component_size=12"]
    test_pixellink_fast.main(argv)


if __name__ == "__main__":
    main(sys.argv[1:])
