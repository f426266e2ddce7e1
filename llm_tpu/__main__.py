from llm_tpu.cli import main

main()
