from yark_spark.cli import main

raise SystemExit(main())
