"""Extract-Load framework: resource contract, watermark state, incremental
runner (the Spark re-expression of the reference's elt-common new framework)."""
