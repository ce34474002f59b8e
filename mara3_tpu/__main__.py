import sys

from mara3_tpu.app.subprogram import main

if __name__ == "__main__":
    sys.exit(main())
