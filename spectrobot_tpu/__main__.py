from spectrobot_tpu.cli import main

raise SystemExit(main())
