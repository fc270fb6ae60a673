import sys

from kss_icp_tpu.cli import main

sys.exit(main())
