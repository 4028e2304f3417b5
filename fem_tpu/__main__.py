import sys

from fem_tpu.cli import main

sys.exit(main())
