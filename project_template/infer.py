import ever_tpu as er


def main(model_dir):
    model, variables, step = er.infer_tool.build_from_model_dir(model_dir)
    # boxes = er.sliding_window((H, W), 512, 512)
    # probs = er.magic.tiled_inference(predict_fn, scene, 512, 512, classes)


if __name__ == '__main__':
    import sys
    main(sys.argv[1])
