terraform {
  required_providers {
    aws = { source = "hashicorp/aws" }
  }
}

provider "aws" {
  region = "us-east-1"
}
provider "aws" {
  alias   = "west"
  region  = "us-west-2"
  version = "~> 4.0"
}

variable "instance_type" {
  type        = string
  default     = "t2.micro"
  description = "EC2 instance type"
  sensitive   = true
  validation {
    condition     = can(regex("^t2", var.instance_type))
    error_message = "Must be t2."
  }
}

locals {
  owner      = "team-a"
  count_expr = length(var.instance_type)
}
locals {
  region = "us-east-1"
}

data "aws_ami" "ubuntu" {
  most_recent = true
  filter {
    name   = "name"
    values = ["ubuntu/images/*"]
  }
}

resource "aws_instance" "app_server" {
  ami           = "ami-830c94e3"
  instance_type = var.instance_type
  count         = 2
  depends_on    = [aws_s3_bucket.b]
  provider      = aws.west
  lifecycle {
    create_before_destroy = true
  }
  tags = { Name = "ExampleAppServerInstance" }
}
resource "aws_instance" "worker" {
  ami   = "ami-830c94e3"
  count = var.replicas
}
resource "aws_cloudtrail" "trail" {}

module "vpc" {
  source  = "terraform-aws-modules/vpc/aws"
  version = "5.0.0"
  cidr    = "10.0.0.0/16"
}

output "instance_ip" {
  value       = aws_instance.app_server[0].public_ip
  description = "IP"
  sensitive   = true
  depends_on  = [aws_instance.app_server]
}

moved {
  from = aws_instance.old
  to   = aws_instance.app_server
}
