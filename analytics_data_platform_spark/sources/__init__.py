"""Source readers: driver testdata parquet, JDBC incremental, REST/JSON,
multi-section CSV, spreadsheet, archive listings."""
