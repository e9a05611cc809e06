from emr2a_tpu.pipelines.step1_manifest.build_manifest import main

if __name__ == "__main__":
    main()
