import sys

from openpose_plus_tpu.cli import main

sys.exit(main())
