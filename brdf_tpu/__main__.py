from brdf_tpu.cli import main

raise SystemExit(main())
